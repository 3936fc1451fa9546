package graft

import org.scalatest.funsuite.AnyFunSuite

class SqlRunnerSpec extends AnyFunSuite {
  test("parseJsonObject handles escapes, unicode, and multiple entries") {
    val json = """{"a": "SELECT 1", "b": "line\nbreak\t\"quoted\"", "c": "uniA"}"""
    val got = SqlRunner.parseJsonObject(json).toMap
    assert(got("a") == "SELECT 1")
    assert(got("b") == "line\nbreak\t\"quoted\"")
    assert(got("c") == "uniA")
  }

  test("parseJsonObject round-trips Verify's writer escaping") {
    // mirror of Verify.q: escape then parse must be identity
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val nasty = "SELECT 'a\\b'\n\tFROM \"t\" WHERE x = ''"
    val json = s"{${q("k")}: ${q(nasty)}}"
    assert(SqlRunner.parseJsonObject(json).toMap.apply("k") == nasty)
  }
}
