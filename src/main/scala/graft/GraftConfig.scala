package graft

import scala.collection.mutable

/** Config-driven job wiring — the reference reads `configs/etl_config.yml`
  * (reference: run.py:16–44) and every job pulls its endpoints, target
  * keys, and column lists from it. This is the same contract for the
  * Spark jobs: a flat-view loader over the YAML SUBSET such configs
  * actually use — nested mappings by 2-space indentation, scalar leaves,
  * quoted strings, inline `[a, b]` lists — with no YAML library (the
  * build allows no new dependencies). Nested keys flatten to dotted
  * paths: `steam_prices_etl.target.trg_key`.
  *
  * Not a general YAML parser by design: anchors, multi-line scalars and
  * block lists are out of scope and surface as a parse error rather than
  * silently misread config.
  */
object GraftConfig {

  /** Load a config file into a flattened dotted-key → value map. */
  def load(path: String): Map[String, String] =
    parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))

  /** Strip a trailing comment, respecting quotes: '#' inside a quoted
    * value is content, not a comment. */
  private def stripComment(raw: String): String = {
    var quote: Char = 0
    var i = 0
    while (i < raw.length) {
      val c = raw(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '#') return raw.substring(0, i)
      i += 1
    }
    raw
  }

  def parse(text: String): Map[String, String] = {
    val out = mutable.LinkedHashMap[String, String]()
    // stack of (indent, key-path)
    var stack = List.empty[(Int, String)]
    text.linesIterator.zipWithIndex.foreach { case (raw, ln) =>
      val noComment = stripComment(raw)
      val line = noComment.trim
      if (line.nonEmpty) {
        require(!noComment.takeWhile(c => c == ' ' || c == '\t').contains('\t'),
          s"line ${ln + 1}: tab indentation is not supported (YAML forbids it; " +
            "silently counting it would misnest keys) — use spaces")
        val indent = noComment.takeWhile(_ == ' ').length
        require(!line.startsWith("- "),
          s"line ${ln + 1}: block lists are not supported — use an inline [a, b] list")
        val sep = line.indexOf(':')
        require(sep > 0, s"line ${ln + 1}: expected 'key: value' or 'key:', got '$line'")
        val key = unquote(line.substring(0, sep).trim)
        val value = line.substring(sep + 1).trim
        stack = stack.filter(_._1 < indent)
        val prefix = stack.headOption.map(_._2 + ".").getOrElse("")
        if (value.isEmpty) {
          stack = (indent, prefix + key) :: stack
        } else {
          out(prefix + key) = unquote(value)
        }
      }
    }
    out.toMap
  }

  /** An inline `[a, b, c]` list value as a trimmed, unquoted sequence.
    * Splits on commas OUTSIDE quotes, so `["a,b", c]` is two elements. */
  def list(cfg: Map[String, String], key: String): Seq[String] = {
    val v = cfg(key)
    require(v.startsWith("[") && v.endsWith("]"), s"$key is not an inline list: $v")
    val body = v.substring(1, v.length - 1).trim
    if (body.isEmpty) Seq.empty
    else {
      val parts = mutable.ArrayBuffer.empty[String]
      val cur = new StringBuilder
      var quote: Char = 0
      body.foreach { c =>
        if (quote != 0) { if (c == quote) quote = 0; cur += c }
        else if (c == '"' || c == '\'') { quote = c; cur += c }
        else if (c == ',') { parts += cur.result(); cur.clear() }
        else cur += c
      }
      parts += cur.result()
      parts.map(s => unquote(s.trim)).toSeq
    }
  }

  private def unquote(s: String): String =
    if (s.length >= 2 &&
      ((s.head == '"' && s.last == '"') || (s.head == '\'' && s.last == '\'')))
      s.substring(1, s.length - 1)
    else s
}
