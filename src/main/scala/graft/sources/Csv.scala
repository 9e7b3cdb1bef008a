package graft.sources

/** Minimal RFC-4180 CSV parsing over whole-file content (quoted fields,
  * embedded commas/newlines/doubled quotes), plus the reference's
  * preamble-tolerant header sniff
  * (normalization.py:335-351 `read_csv_with_optional_header`): scan the
  * first 100 lines for one starting with a known header prefix and
  * parse from there; if absent, the first row is the header.
  *
  * Runs inside per-file executor tasks (the readers parse one export
  * file per task), so nothing here touches the driver.
  */
object Csv {

  /** Parse full CSV content into rows of cells. */
  def parse(content: String): Vector[Vector[String]] = {
    val rows = Vector.newBuilder[Vector[String]]
    var row = Vector.newBuilder[String]
    val cell = new StringBuilder
    var inQuotes = false
    var sawAny = false
    var i = 0
    val n = content.length
    while (i < n) {
      val c = content.charAt(i)
      if (inQuotes) {
        if (c == '"') {
          if (i + 1 < n && content.charAt(i + 1) == '"') { cell += '"'; i += 1 }
          else inQuotes = false
        } else cell += c
      } else c match {
        case '"' => inQuotes = true; sawAny = true
        case ',' => row += cell.result(); cell.clear(); sawAny = true
        case '\r' =>
          if (i + 1 < n && content.charAt(i + 1) == '\n') i += 1
          if (sawAny || cell.nonEmpty) { row += cell.result(); rows += row.result() }
          cell.clear(); row = Vector.newBuilder[String]; sawAny = false
        case '\n' =>
          if (sawAny || cell.nonEmpty) { row += cell.result(); rows += row.result() }
          cell.clear(); row = Vector.newBuilder[String]; sawAny = false
        case other => cell += other; sawAny = true
      }
      i += 1
    }
    if (sawAny || cell.nonEmpty) { row += cell.result(); rows += row.result() }
    rows.result()
  }

  /** A parsed table: ordered header + rows, with the reference's
    * null-tolerant trimmed access (`safe_get`, normalization.py:360-369).
    */
  final case class Table(header: Vector[String], rows: Vector[Vector[String]]) {
    private val index: Map[String, Int] = header.zipWithIndex.toMap
    def get(row: Vector[String], column: String): String =
      index.get(column).filter(_ < row.length).map(row(_).trim).getOrElse("")
  }

  /** Read a table; when `headerStartsWith` is given, slice the content
    * from the first of the first 100 lines starting with that prefix
    * (the LinkedIn export preamble skip). */
  def table(content: String, headerStartsWith: Option[String] = None): Table = {
    val sliced = headerStartsWith match {
      case Some(prefix) =>
        val lines = content.split("\r?\n", -1)
        lines.take(100).indexWhere(_.trim.startsWith(prefix)) match {
          case -1 => content
          case idx => lines.drop(idx).mkString("\n")
        }
      case None => content
    }
    parse(sliced) match {
      case head +: tail => Table(head, tail)
      case _ => Table(Vector.empty, Vector.empty)
    }
  }
}
