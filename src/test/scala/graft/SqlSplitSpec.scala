package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cli.Main

class SqlSplitSpec extends AnyFunSuite {

  test("dgrep argv: flags anywhere, combos, and -- literal escape") {
    assert(Main.parseDgrep(List("pat")) == Some((Set.empty[Char], "pat")))
    assert(Main.parseDgrep(List("-c", "pat")) == Some((Set('c'), "pat")))
    assert(Main.parseDgrep(List("pat", "-i", "-v")) ==
      Some((Set('i', 'v'), "pat")))
    assert(Main.parseDgrep(List("-ivE", "pat")) ==
      Some((Set('i', 'v', 'E'), "pat")))
    // grep-style --: a flag-shaped literal pattern stays searchable
    assert(Main.parseDgrep(List("--", "-c")) == Some((Set.empty[Char], "-c")))
    assert(Main.parseDgrep(List("-i", "--", "-vc")) ==
      Some((Set('i'), "-vc")))
    // unknown flag chars are treated as the pattern, not silently eaten
    assert(Main.parseDgrep(List("-x", "pat")) == None)
    assert(Main.parseDgrep(List("-c")) == None) // no pattern
    assert(Main.parseDgrep(List("a", "b")) == None) // two patterns
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
