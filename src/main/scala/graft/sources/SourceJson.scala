package graft.sources

/** Registry round-trip for [[FeatureSource]]: the reference serializes its
  * source as a DataSourceProto carrying a PICKLED options payload
  * (ref: feast_hive/hive_source.py:50-78, 164-198) — opaque and
  * python-only. Here the registry form is plain JSON (hand-rolled — the
  * build is dependency-free by design), human-readable and stable across
  * versions. */
object SourceJson {

  private def esc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def q(s: String): String = "\"" + esc(s) + "\""

  def toJson(src: FeatureSource): String = {
    val fields = Seq(
      src.table.map(v => s"${q("table")}: ${q(v)}"),
      src.query.map(v => s"${q("query")}: ${q(v)}"),
      src.path.map(v => s"${q("path")}: ${q(v)}"),
      Some(s"${q("eventTimestampColumn")}: ${q(src.eventTimestampColumn)}"),
      src.createdTimestampColumn.map(v =>
        s"${q("createdTimestampColumn")}: ${q(v)}"),
      if (src.fieldMapping.nonEmpty)
        Some(s"${q("fieldMapping")}: {" +
          src.fieldMapping.toSeq.sortBy(_._1)
            .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString(", ") + "}")
      else None,
      src.datePartitionColumn.map(v => s"${q("datePartitionColumn")}: ${q(v)}"),
      src.name.map(v => s"${q("name")}: ${q(v)}")
    ).flatten
    fields.mkString("{", ", ", "}")
  }

  /** Minimal recursive-descent parser for the object shape emitted by
    * [[toJson]] (string values and one nested string-map). */
  def fromJson(json: String): FeatureSource = {
    val p = new Parser(json)
    val top = p.parseObject()
    val mapping = top.get("fieldMapping") match {
      case Some(m: Map[_, _]) =>
        m.map { case (k, v) => k.toString -> v.toString }
      case _ => Map.empty[String, String]
    }
    def str(k: String): Option[String] = top.get(k).map(_.toString)
    FeatureSource(
      table = str("table"),
      query = str("query"),
      path = str("path"),
      eventTimestampColumn = str("eventTimestampColumn")
        .getOrElse("event_timestamp"),
      createdTimestampColumn = str("createdTimestampColumn"),
      fieldMapping = mapping,
      datePartitionColumn = str("datePartitionColumn"),
      name = str("name"))
  }

  private final class Parser(s: String) {
    private var i = 0
    private def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    private def expect(c: Char): Unit = {
      ws()
      if (i >= s.length || s(i) != c)
        throw new IllegalArgumentException(
          s"SourceJson: expected '$c' at offset $i in: $s")
      i += 1
    }
    private def parseString(): String = {
      expect('"')
      val sb = new StringBuilder
      while (s(i) != '"') {
        if (s(i) == '\\') {
          i += 1
          s(i) match {
            case '"'  => sb += '"'
            case '\\' => sb += '\\'
            case 'n'  => sb += '\n'
            case 'r'  => sb += '\r'
            case 't'  => sb += '\t'
            case 'u' =>
              sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar
              i += 4
            case other => sb += other
          }
        } else sb += s(i)
        i += 1
      }
      i += 1
      sb.result()
    }
    def parseObject(): Map[String, Any] = {
      expect('{')
      val out = Map.newBuilder[String, Any]
      ws()
      if (i < s.length && s(i) == '}') { i += 1; return out.result() }
      var done = false
      while (!done) {
        ws()
        val k = parseString()
        expect(':')
        ws()
        val v: Any = if (s(i) == '{') parseObject() else parseString()
        out += (k -> v)
        ws()
        if (i < s.length && s(i) == ',') i += 1 else done = true
      }
      expect('}')
      out.result()
    }
  }
}
