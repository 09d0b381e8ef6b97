package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cli.Main

class SqlSplitSpec extends AnyFunSuite {

  test("dgrep argv: flags anywhere, combos, and -- literal escape") {
    def p(args: String*): Option[(Set[Char], String)] =
      Main.parseDgrep(args.toList).map(a => (a.flags, a.pattern))
    assert(p("pat") == Some((Set.empty[Char], "pat")))
    assert(p("-c", "pat") == Some((Set('c'), "pat")))
    assert(p("pat", "-i", "-v") == Some((Set('i', 'v'), "pat")))
    assert(p("-ivE", "pat") == Some((Set('i', 'v', 'E'), "pat")))
    // grep-style --: a flag-shaped literal pattern stays searchable
    assert(p("--", "-c") == Some((Set.empty[Char], "-c")))
    assert(p("-i", "--", "-vc") == Some((Set('i'), "-vc")))
    // unknown flag chars are treated as the pattern, not silently eaten
    assert(p("-x", "pat") == None)
    assert(p("-c") == None) // no pattern
    assert(p("a", "b") == None) // two patterns
  }

  test("dgrep argv: --limit and --out take values, anywhere before --") {
    assert(Main.parseDgrep(List("--limit", "10", "-i", "pat")) ==
      Some(Main.DgrepArgs(Set('i'), "pat", Some(10), None)))
    assert(Main.parseDgrep(List("pat", "--out", "/tmp/o")) ==
      Some(Main.DgrepArgs(Set.empty, "pat", None, Some("/tmp/o"))))
    assert(Main.parseDgrep(List("--limit", "5", "--out", "o", "--", "-c")) ==
      Some(Main.DgrepArgs(Set.empty, "-c", Some(5), Some("o"))))
    // malformed: missing/invalid value is an argv error, not a pattern
    assert(Main.parseDgrep(List("--limit", "pat")) == None)
    assert(Main.parseDgrep(List("pat", "--limit")) == None)
    assert(Main.parseDgrep(List("--limit", "0", "pat")) == None)
    // after the -- separator they are literal patterns again
    assert(Main.parseDgrep(List("--", "--limit")) ==
      Some(Main.DgrepArgs(Set.empty, "--limit", None, None)))
  }

  test("splits on top-level semicolons only") {
    assert(Main.splitSql("SELECT 1; SELECT 2") ==
      Seq("SELECT 1", "SELECT 2"))
    assert(Main.splitSql("SELECT ';' AS sep FROM nation") ==
      Seq("SELECT ';' AS sep FROM nation"))
    assert(Main.splitSql("SELECT \"a;b\" FROM t; SELECT 2") ==
      Seq("SELECT \"a;b\" FROM t", "SELECT 2"))
    assert(Main.splitSql("SELECT 1 -- trailing; comment\n; SELECT 2") ==
      Seq("SELECT 1 -- trailing; comment", "SELECT 2"))
    assert(Main.splitSql("  ;; SELECT 1 ;  ") == Seq("SELECT 1"))
    assert(Main.splitSql("SELECT 'it''s; fine'") ==
      Seq("SELECT 'it''s; fine'"))
    assert(Main.splitSql("SELECT 1 /* note; more */; SELECT 2") ==
      Seq("SELECT 1 /* note; more */", "SELECT 2"))
    assert(Main.splitSql("/* header;\n spanning; lines */ SELECT 1") ==
      Seq("/* header;\n spanning; lines */ SELECT 1"))
  }

  test("backslash-escaped quotes do not end the string state") {
    // Spark's default dialect (escapedStringLiterals=false): 'it\'s'
    assert(Main.splitSql("SELECT 'it\\'s; fine'; SELECT 2") ==
      Seq("SELECT 'it\\'s; fine'", "SELECT 2"))
    assert(Main.splitSql("SELECT \"a\\\";b\" FROM t; SELECT 2") ==
      Seq("SELECT \"a\\\";b\" FROM t", "SELECT 2"))
    // backslash at the very end of the text must not read past the input
    assert(Main.splitSql("SELECT '\\") == Seq("SELECT '\\"))
    // escaped backslash then a real closing quote
    assert(Main.splitSql("SELECT 'a\\\\'; SELECT 2") ==
      Seq("SELECT 'a\\\\'", "SELECT 2"))
  }
}
