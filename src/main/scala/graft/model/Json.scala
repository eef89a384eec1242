package graft.model

/** Minimal JSON string escaping for the hand-assembled payload literals
  * (node payloads follow the reference's compact-union shape, built by
  * template — a site name or externally-resolved taxon name containing
  * `"` or `\` must not corrupt the document).
  */
object Json {
  /** Escaped CONTENT of a JSON string (no surrounding quotes). */
  def str(s: String): String = {
    val sb = new StringBuilder
    Option(s).getOrElse("").foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }
}
