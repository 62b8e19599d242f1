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
    var i = 1 // past '['
    val n = s.length
    var closed = false
    var expectElem = true
    val elems = scala.collection.mutable.ListBuffer.empty[String]

    // one quoted string literal starting at s(start); returns the decoded
    // content and the index past the closing quote, or None on malformed
    def parseStr(start: Int): Option[(String, Int)] = {
      val quote = s.charAt(start)
      val sb = new StringBuilder
      var j = start + 1
      // ASCII hex only (Character.digit would accept fullwidth/Arabic
      // digits that python's escape grammar rejects as a SyntaxError);
      // accumulate in Long so an 8-digit \U value can't overflow parseInt
      def hex(len: Int): Option[Int] = {
        def isHex(c: Char) = (c >= '0' && c <= '9') ||
          (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
        if (j + len <= n && s.substring(j, j + len).forall(isHex)) {
          val v = java.lang.Long.parseLong(s.substring(j, j + len), 16)
          // python caps escapes at U+10FFFF (ValueError above it)
          if (v > 0x10FFFFL) None
          else { j += len; Some(v.toInt) }
        } else None
      }
      while (j < n) {
        val ch = s.charAt(j)
        if (ch == '\\' && j + 1 < n) {
          // python escape rules (eval semantics): recognized escapes
          // translate; an UNRECOGNIZED escape keeps the backslash
          // (eval("'\\d'") == "\\d"); a malformed \x/\u without its hex
          // digits is a SyntaxError in python -> None here
          val e = s.charAt(j + 1)
          j += 2
          e match {
            case 'n' => sb.append('\n')
            case 't' => sb.append('\t')
            case 'r' => sb.append('\r')
            case 'a' => sb.append('\u0007')
            case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case 'v' => sb.append('\u000B')
            case '\\' => sb.append('\\')
            case '\'' => sb.append('\'')
            case '"' => sb.append('"')
            case 'x' => hex(2) match {
              case Some(v) => sb.append(v.toChar)
              case None => return None
            }
            case 'u' => hex(4) match {
              case Some(v) => sb.append(v.toChar)
              case None => return None
            }
            case 'U' => hex(8) match {
              case Some(v) => sb.appendAll(Character.toChars(v))
              case None => return None
            }
            case d if d >= '0' && d <= '7' =>
              // octal: \o, \oo, \ooo (greedy up to 3 digits total)
              var v = d - '0'
              var taken = 1
              while (taken < 3 && j < n &&
                  s.charAt(j) >= '0' && s.charAt(j) <= '7') {
                v = v * 8 + (s.charAt(j) - '0')
                j += 1
                taken += 1
              }
              sb.append(v.toChar)
            case other => sb.append('\\').append(other)
          }
        } else if (ch == quote) return Some((sb.result(), j + 1))
        else { sb.append(ch); j += 1 }
      }
      None // unterminated
    }

    while (i < n && !closed) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == ']') { closed = true; i += 1 }
      else if (c == ',') {
        if (expectElem) return None // leading/double comma
        expectElem = true; i += 1
      }
      else if (c == '\'' || c == '"') {
        parseStr(i) match {
          case Some((str, next)) =>
            // python concatenates ADJACENT string literals: ['a' 'b'] ==
            // ["ab"] -- a quote while not expecting an element extends the
            // previous one
            if (expectElem) elems += str
            else elems(elems.length - 1) = elems.last + str
            expectElem = false
            i = next
          case None => return None
        }
      }
      else return None // non-string element
    }
    if (!closed) return None
    // trailing junk after ']' (other than whitespace) is malformed
    if (s.substring(i).trim.nonEmpty) return None
    Some(elems.toList)
  }

  /** Column form: STRING → ARRAY<STRING> (null on malformed input). */
  def parse_py_string_list(c: Column): Column = {
    val u = udf((s: String) => parseStringList(s).orNull)
    u(c)
  }
}
