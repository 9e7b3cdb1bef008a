package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Deterministic UUIDv5 (RFC 4122 name-based, SHA-1) with the
  * reference's fixed namespace (common.py:72-74). Contact ids must be
  * stable across engines/runs for cross-engine comparison.
  */
object Ids {
  private val Namespace: Array[Byte] = uuidToBytes("12345678-1234-5678-1234-567812345678")

  private def uuidToBytes(u: String): Array[Byte] = {
    val hex = u.replace("-", "")
    Array.tabulate(16)(i => Integer.parseInt(hex.substring(i * 2, i * 2 + 2), 16).toByte)
  }

  /** SHA-1 instances are stateful and not thread-safe; one per task
    * thread instead of one per row (getInstance is a provider lookup). */
  private val md1 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("SHA-1"))

  private def digestToUuid(md: MessageDigest): String = {
    val hash = md.digest().take(16)
    hash(6) = ((hash(6) & 0x0f) | 0x50).toByte // version 5
    hash(8) = ((hash(8) & 0x3f) | 0x80).toByte // RFC 4122 variant
    val hex = hash.map(b => f"${b & 0xff}%02x").mkString
    s"${hex.substring(0, 8)}-${hex.substring(8, 12)}-${hex.substring(12, 16)}-${hex.substring(16, 20)}-${hex.substring(20, 32)}"
  }

  def uuid5(name: String): String = {
    val md = md1.get()
    md.reset()
    md.update(Namespace)
    md.update(Option(name).getOrElse("").getBytes(StandardCharsets.UTF_8))
    digestToUuid(md)
  }

  /** UTF8String entry point for the codegen'd Catalyst expression
    * ([[graft.plans.Uuid5]]): hashes the value's UTF-8 bytes directly —
    * no String round-trip, no boxing in the generated code. */
  def uuid5UTF8(name: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    val md = md1.get()
    md.reset()
    md.update(Namespace)
    if (name != null) md.update(name.getBytes)
    org.apache.spark.unsafe.types.UTF8String.fromString(digestToUuid(md))
  }
}
