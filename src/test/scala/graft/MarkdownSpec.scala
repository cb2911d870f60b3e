package graft

import graft.ops.Markdown
import org.scalatest.funsuite.AnyFunSuite

class MarkdownSpec extends AnyFunSuite {

  private def x(s: String): Vector[String] = Markdown.extractText(s)

  test("fixture round-trip: 80 seeds extract exactly the closed-form text") {
    for (seed <- 0L until 80L) {
      val got = Markdown.extractText(Markdown.syntheticMarkdown(seed))
      assert(got == Markdown.logicalText(seed), s"seed $seed")
    }
  }

  test("front matter drops; unterminated front matter is a thematic break") {
    assert(x("---\ntitle: T\n---\nbody") == Vector("body"))
    assert(x("---\ntitle: T\n...\nbody") == Vector("body"))
    // unterminated: the opening --- is an ordinary rule, the rest is text
    assert(x("---\ntitle: T") == Vector("title: T"))
    // front matter only at line 0
    assert(x("body\n---\nk: v\n---\ntail") == Vector("body", "k: v", "tail"))
  }

  test("fenced code keeps content verbatim, fences and info drop") {
    assert(x("```scala\nval a = *b* _c_\n```\npara") ==
      Vector("val a = *b* _c_", "para"))
    // unterminated fence runs to EOF (CommonMark)
    assert(x("```\ncode1\ncode2") == Vector("code1", "code2"))
    // a shorter closing run does not close; a longer one does
    assert(x("````\n```\ncode\n`````\npara") == Vector("```", "code", "para"))
    // tilde fences too; backtick info may not contain a backtick
    assert(x("~~~text\n**raw**\n~~~") == Vector("**raw**"))
    assert(x("``` a`b\nnot a fence") == Vector("``` a`b", "not a fence"))
  }

  test("indented code needs a preceding blank and dedents once") {
    assert(x("para\n\n    code *x*\n    more\npara2") ==
      Vector("para", "code *x*", "more", "para2"))
    // without the blank it is a lazy paragraph continuation
    assert(x("para\n    cont") == Vector("para", "cont"))
    assert(x("\n\tcode") == Vector("code"))
  }

  test("headings: ATX strips both ends, setext underline drops, 7 hashes is prose") {
    assert(x("## Head ##") == Vector("Head"))
    assert(x("# Head") == Vector("Head"))
    assert(x("####### seven") == Vector("####### seven"))
    assert(x("Title\n=====\nbody") == Vector("Title", "body"))
    assert(x("Title\n---\nbody") == Vector("Title", "body"))
  }

  test("thematic breaks and reference definitions drop") {
    assert(x("a\n\n---\n\n***\n\n_ _ _\n\nb") == Vector("a", "b"))
    assert(x("[ref]: https://e.org \"t\"\nuse [it][ref] now") ==
      Vector("use it now"))
  }

  test("blockquotes and list markers strip with nesting") {
    assert(x("> quoted") == Vector("quoted"))
    assert(x("> > deep") == Vector("deep"))
    assert(x("- item\n+ plus\n* star\n12. ordered\n3) paren") ==
      Vector("item", "plus", "star", "ordered", "paren"))
    assert(x("- - nested") == Vector("nested"))
    assert(x("> - quoted item") == Vector("quoted item"))
  }

  test("GFM tables: rows TAB-join, delimiter row drops, escaped pipe is literal") {
    assert(x("| a | b |\n| --- | :-: |\n| c | d |") ==
      Vector("a\tb", "c\td"))
    assert(x("| x \\| y | z |") == Vector("x | y\tz"))
  }

  test("emphasis: flanking pairs drop, intraword and unpaired stay literal") {
    assert(x("**bold** and *ital* and ~~gone~~ and _em_") ==
      Vector("bold and ital and gone and em"))
    assert(x("snake_case stays_put") == Vector("snake_case stays_put"))
    assert(x("a * b * c") == Vector("a * b * c"), "space-flanked stars literal")
    assert(x("*unclosed") == Vector("*unclosed"))
    assert(x("2*3*4 = 24") == Vector("234 = 24"), "star emphasis is intraword")
    // single ~ is not strikethrough
    assert(x("~one~ and ~~~three~~~") == Vector("~one~ and ~~~three~~~"))
  }

  test("code spans protect content; unmatched backticks stay literal") {
    assert(x("a `*lit*` b") == Vector("a *lit* b"))
    assert(x("a ``has ` tick`` b") == Vector("a has ` tick b"))
    assert(x("a ` unterminated") == Vector("a ` unterminated"))
  }

  test("links keep text, images keep alt, bare brackets are prose") {
    assert(x("see [text](https://e.org/p \"t\") end") == Vector("see text end"))
    assert(x("see [text][ref] end") == Vector("see text end"))
    assert(x("![alt words](img.png)") == Vector("alt words"))
    assert(x("a [sic] b") == Vector("a [sic] b"))
    assert(x("nested [out [in] side](u) t") == Vector("nested out [in] side t"))
  }

  test("autolinks keep target, html tags drop, stray angle brackets literal") {
    assert(x("go <https://e.org/x> now") == Vector("go https://e.org/x now"))
    assert(x("mail <a@b.org> me") == Vector("mail a@b.org me"))
    assert(x("<span class=\"x\">word</span> tail") == Vector("word tail"))
    assert(x("1 < 2 and 3 > 2") == Vector("1 < 2 and 3 > 2"))
  }

  test("escapes and entities decode; unknown entities stay literal") {
    assert(x("\\*not\\* \\[lit\\]") == Vector("*not* [lit]"))
    assert(x("&amp; &lt; &#65; &#x42; &copy;") == Vector("& < A B ©"))
    assert(x("&bogus; &#xfffffff; &;") == Vector("&bogus; &#xfffffff; &;"))
  }

  test("hard-break markers trim; NUL sanitizes; extraction is total") {
    assert(x("line with trailing  \nnext") == Vector("line with trailing", "next"))
    assert(x("broken\\\nnext") == Vector("broken", "next"))
    assert(x("a\u0000b") == Vector("a\ufffdb"))
    assert(Markdown.extractText(null) == Vector.empty)
    // totality fuzz: structured fragments spliced at seeded offsets
    val frags = Array("**", "```", "[x](", "| a |", "> ", "####", "&#x", "\\",
      "~~", "<tag", "---", "    ", "`` ` ``", "![a][", "_ _", "&amp")
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 500) {
      val n = rnd.nextInt(12)
      val s = (0 until n).map(_ => frags(rnd.nextInt(frags.length)))
        .mkString(rnd.nextInt(3) match {
          case 0 => "" case 1 => " " case _ => "\n"
        })
      Markdown.extractText(s) // must not throw
    }
  }

  test("fixture dump for the independent Python mirror") {
    val dir = java.nio.file.Paths.get("target", "md-fixtures")
    java.nio.file.Files.createDirectories(dir)
    (0L until 24L).foreach { seed =>
      java.nio.file.Files.write(dir.resolve(s"seed$seed.md"),
        Markdown.syntheticMarkdown(seed)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.write(dir.resolve(s"seed$seed.txt"),
        Markdown.logicalText(seed).mkString("\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    assert(java.nio.file.Files.exists(dir.resolve("seed0.md")))
  }
}
