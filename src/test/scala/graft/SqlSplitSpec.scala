package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cli.Main

class SqlSplitSpec extends AnyFunSuite {
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
