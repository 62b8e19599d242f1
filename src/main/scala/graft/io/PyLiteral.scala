package graft.io

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Python list-of-strings literal parser — the S4 contract.
  *
  * The reference parses NQ qa.csv answer fields with `eval()`
  * (dataprocess/NQ_dpr/get_answers.py:15-29): elements quoted with ' or ",
  * backslash escapes inside, and a CSV pre-treatment for lines that don't
  * start with '[' (`strip('"')` + `'""'→'"'`). A regex over `'([^']*)'`
  * breaks on the first real apostrophe (`"it's"`); this is a character
  * scanner implementing eval's actual quoting rules for the string-literal
  * subset that appears in the data.
  */
object PyLiteral {

  /** Parse a python list-of-strings literal. Returns None when the input
    * is not a well-formed list of string literals (the reference's eval
    * would raise there — callers decide whether to drop or fail).
    */
  def parseStringList(raw: String): Option[Seq[String]] = {
    if (raw == null) return None
    var s = raw.trim
    if (s.isEmpty) return None
    if (s.head != '[') {
      // get_answers.py:22-23: answers.strip('"').replace('""', '"')
      s = s.dropWhile(_ == '"').reverse.dropWhile(_ == '"').reverse
        .replace("\"\"", "\"")
      if (s.isEmpty || s.head != '[') return None
    }
    val out = Seq.newBuilder[String]
    var i = 1 // past '['
    val n = s.length
    var closed = false
    var expectElem = true
    while (i < n && !closed) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == ']') { closed = true; i += 1 }
      else if (c == ',') {
        if (expectElem) return None // leading/double comma
        expectElem = true; i += 1
      }
      else if (c == '\'' || c == '"') {
        if (!expectElem) return None // two adjacent strings
        val quote = c
        val sb = new StringBuilder
        i += 1
        var done = false
        while (i < n && !done) {
          val ch = s.charAt(i)
          if (ch == '\\' && i + 1 < n) {
            // python escape rules: known escapes translate, unknown ones
            // keep the backslash (eval("'\\d'") == "\\d")
            val e = s.charAt(i + 1)
            sb.append(e match {
              case 'n' => "\n"
              case 't' => "\t"
              case 'r' => "\r"
              case '\\' => "\\"
              case '\'' => "'"
              case '"' => "\""
              case '0' => "\u0000"
              case other => "\\" + other
            })
            i += 2
          } else if (ch == quote) { done = true; i += 1 }
          else { sb.append(ch); i += 1 }
        }
        if (!done) return None // unterminated string
        out += sb.result()
        expectElem = false
      }
      else return None // non-string element
    }
    if (!closed) return None
    // trailing junk after ']' (other than whitespace) is malformed
    if (s.substring(i).trim.nonEmpty) return None
    Some(out.result())
  }

  /** Column form: STRING → ARRAY<STRING> (null on malformed input). */
  def parse_py_string_list(c: Column): Column = {
    val u = udf((s: String) => parseStringList(s).orNull)
    u(c)
  }
}
