package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Chunker

/** Parity + property tests for the reference chunker port
  * (/root/reference/src/core/document_processor.py:48-136 semantics —
  * see Chunker.scala scaladoc for the cited behaviors). Property cases
  * use a seeded generator (deterministic, no framework dependency).
  */
class ChunkerSpec extends AnyFunSuite {

  private def genTexts(n: Int): Seq[String] = {
    val rnd = new scala.util.Random(42)
    val chars = "abcdefghijklmnopqrstuvwxyz0123456789"
    (0 until n).map { _ =>
      val len = rnd.nextInt(500)
      (0 until len).map { _ =>
        val r = rnd.nextInt(10)
        if (r < 8) chars(rnd.nextInt(chars.length))
        else " \n\t.,"(rnd.nextInt(5))
      }.mkString
    }
  }

  test("empty and blank content produce no chunks") {
    assert(Chunker.chunk("", 100, 20).isEmpty)
    assert(Chunker.chunk("   \n\t  ", 100, 20).isEmpty)
    assert(Chunker.chunk(null, 100, 20).isEmpty)
  }

  test("content shorter than chunk_size yields exactly one chunk") {
    val cs = Chunker.chunk("hello world", 100, 20)
    assert(cs.length == 1)
    assert(cs.head.content == "hello world")
    assert(cs.head.isFirst && cs.head.isLast)
    assert(cs.head.startChar == 0 && cs.head.endChar == 11)
  }

  test("boundary snapping: end moves back to just after a boundary char") {
    val text = "the quick brown fox jumped over the lazy dog"
    val cs = Chunker.chunk(text, 20, 5)
    // char 20 lands inside 'jumped'; the backward scan (inclusive of the
    // probe position, reference :131-133) finds the space and returns i+1
    assert(cs.head.endChar <= 21)
    assert(!cs.head.content.endsWith("jumpe"))
  }

  test("no-whitespace input: hard cut at chunk_size (no boundary found)") {
    val text = "a" * 250
    val cs = Chunker.chunk(text, 100, 0)
    assert(cs.map(_.content) == Seq("a" * 100, "a" * 100, "a" * 50))
    assert(cs.map(_.startChar) == Seq(0, 100, 200))
  }

  test("overlap is clamped to chunk_size/2") {
    // clamp 90 -> 50, stride 50; final window [200,300) reaches the end
    val text = "b" * 300
    val cs = Chunker.chunk(text, 100, 90)
    assert(cs.map(_.startChar) == Seq(0, 50, 100, 150, 200))
    assert(cs.last.endChar == 300)
  }

  test("pathological input terminates (start-not-advancing break, reference :119-121)") {
    val text = " " * 150 + "x"
    val cs = Chunker.chunk(text, 100, 50)
    assert(cs.length <= 2) // must terminate, not loop
  }

  test("property: chunks start at 0, are strictly increasing, stay in range") {
    genTexts(300).foreach { text =>
      val cs = Chunker.chunk(text, 50, 10)
      if (cs.nonEmpty) assert(cs.head.startChar == 0)
      val starts = cs.map(_.startChar)
      assert(starts == starts.sorted && starts.distinct == starts)
      cs.foreach { c =>
        assert(c.startChar >= 0 && c.endChar <= text.length)
        assert(c.startChar < c.endChar)
      }
    }
  }

  test("property: chunk content equals stripped slice of the original") {
    genTexts(300).foreach { text =>
      Chunker.chunk(text, 80, 20).foreach { c =>
        assert(c.content == text.substring(c.startChar, c.endChar).trim)
        assert(c.chunkSize == c.content.length)
      }
    }
  }

  test("property: consecutive windows overlap by at most the clamped overlap") {
    genTexts(300).foreach { text =>
      Chunker.chunk(text, 60, 30).sliding(2).foreach {
        case Seq(a, b) => assert(b.startChar >= a.endChar - 30)
        case _ => ()
      }
    }
  }

  test("property: chunk indexes are dense from 0; exactly one first/last flag") {
    genTexts(300).foreach { text =>
      val cs = Chunker.chunk(text, 70, 10)
      assert(cs.map(_.chunkIndex) == cs.indices)
      if (cs.nonEmpty) {
        assert(cs.count(_.isFirst) == 1 && cs.head.isFirst)
        // isLast marks chunks whose window reached the end of content
        assert(cs.last.isLast == (cs.last.endChar >= text.length))
      }
    }
  }
}
