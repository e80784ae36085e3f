package graft

import org.scalatest.funsuite.AnyFunSuite

class ConfigSpec extends AnyFunSuite {

  test("parser: nesting, quoting, comments, inline lists") {
    val cfg = GraftConfig.parse(
      """# top comment
        |a:
        |  b: plain
        |  c: "double quoted"  # trailing comment
        |  d: 'single quoted'
        |  nested:
        |    deep: 42
        |  after_nested: back
        |top: value
        |lists:
        |  empty: []
        |  mixed: [1, 'two', "three"]
        |""".stripMargin)
    assert(cfg("a.b") == "plain")
    assert(cfg("a.c") == "double quoted")
    assert(cfg("a.d") == "single quoted")
    assert(cfg("a.nested.deep") == "42")
    assert(cfg("a.after_nested") == "back", "dedent must pop the nesting stack")
    assert(cfg("top") == "value")
    assert(GraftConfig.list(cfg, "lists.empty").isEmpty)
    assert(GraftConfig.list(cfg, "lists.mixed") == Seq("1", "two", "three"))
  }

  test("parser: quotes protect '#' and commas; tabs rejected") {
    val cfg = GraftConfig.parse(
      """k1: "value#with#hashes"   # this one IS a comment
        |k2: 'http://x/#frag'
        |names: ["a,b", 'c,d', e]
        |""".stripMargin)
    assert(cfg("k1") == "value#with#hashes")
    assert(cfg("k2") == "http://x/#frag")
    assert(GraftConfig.list(cfg, "names") == Seq("a,b", "c,d", "e"))
    val tabs = intercept[IllegalArgumentException](
      GraftConfig.parse("a:\n\tb: 1\n"))
    assert(tabs.getMessage.contains("tab indentation"))
  }

  test("parser: unsupported YAML surfaces as an error, never a silent misread") {
    val block = intercept[IllegalArgumentException](
      GraftConfig.parse("xs:\n  - one\n  - two\n"))
    assert(block.getMessage.contains("block lists"))
    val bad = intercept[IllegalArgumentException](GraftConfig.parse("just a line\n"))
    assert(bad.getMessage.contains("expected 'key: value'"))
  }
}
