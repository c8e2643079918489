package graft.extract

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic HTML -> text / links extraction.
  *
  * The reference repo has no extractor (it is a C++ SpMV suite); the
  * BASELINE.json `input_hint` invariant "byte-identical extracted text per
  * url" is therefore pinned by THIS spec (SURVEY.md §7.2.2): pure function of
  * the html bytes, UTF-8 only, no locale, no library. Pipeline:
  *
  *   1. UTF-8 decode
  *   2. slice to the <body>...</body> region (whole doc if absent)
  *   3. drop <script>/<style> blocks (case-insensitive)
  *   4. every remaining tag becomes a single space
  *   5. decode HTML entities (&amp; &lt; &gt; &quot; &#39; &apos; &nbsp;
  *      and numeric &#NNN; / &#xHH;)
  *   6. collapse whitespace runs to one space, trim
  *
  * The Scala methods are pure and driver-testable; `textOf`/`linksOf` expose
  * them to Catalyst. Extraction is CPU-bound scalar work — a deterministic
  * Scala UDF keeps it one narrow codegen-adjacent stage (SURVEY.md §7.4).
  */
object Extract {

  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    val n = needle.length
    var i = from
    val max = s.length - n
    while (i <= max) {
      if (s.regionMatches(true, i, needle, 0, n)) return i
      i += 1
    }
    -1
  }

  /** Remove <tag ...>...</tag> blocks (script/style), case-insensitive. */
  private def dropBlocks(s: String, tag: String): String = {
    val open = "<" + tag
    val close = "</" + tag
    // java.lang.StringBuilder: the Scala one lacks append(CharSequence,
    // start, end) and silently auto-tuples the arguments instead.
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val o = indexOfIgnoreCase(s, open, i)
      if (o < 0) { sb.append(s, i, s.length); i = s.length }
      else {
        sb.append(s, i, o)
        val c = indexOfIgnoreCase(s, close, o)
        if (c < 0) { i = s.length } // unterminated block: drop rest
        else {
          val gt = s.indexOf('>', c)
          i = if (gt < 0) s.length else gt + 1
        }
      }
    }
    sb.toString
  }

  private def decodeEntity(s: String, amp: Int): (String, Int) = {
    val semi = s.indexOf(';', amp + 1)
    if (semi < 0 || semi - amp > 10) return ("&", amp + 1)
    val body = s.substring(amp + 1, semi)
    val decoded: String = body match {
      case "amp"  => "&"
      case "lt"   => "<"
      case "gt"   => ">"
      case "quot" => "\""
      case "apos" => "'"
      case "nbsp" => " "
      case b if b.startsWith("#x") || b.startsWith("#X") =>
        try String.valueOf(Integer.parseInt(b.substring(2), 16).toChar)
        catch { case _: Exception => null }
      case b if b.startsWith("#") =>
        try String.valueOf(Integer.parseInt(b.substring(1)).toChar)
        catch { case _: Exception => null }
      case _ => null
    }
    if (decoded == null) ("&", amp + 1) else (decoded, semi + 1)
  }

  /** The extractor: html bytes -> normalized text. Pure; byte-reproducible. */
  def extractText(html: Array[Byte]): String = {
    if (html == null) return null
    val full = new String(html, StandardCharsets.UTF_8)
    // 2. body slice
    val bodyOpen = indexOfIgnoreCase(full, "<body", 0)
    val sliced =
      if (bodyOpen < 0) full
      else {
        val gt = full.indexOf('>', bodyOpen)
        val bodyClose = indexOfIgnoreCase(full, "</body", bodyOpen)
        val start = if (gt < 0) bodyOpen else gt + 1
        val end = if (bodyClose < 0) full.length else bodyClose
        full.substring(start, end)
      }
    // 3. script/style blocks
    val noBlocks = dropBlocks(dropBlocks(sliced, "script"), "style")
    // 4. tags -> space, 5. entities
    val sb = new StringBuilder(noBlocks.length)
    var i = 0
    while (i < noBlocks.length) {
      noBlocks.charAt(i) match {
        case '<' =>
          val gt = noBlocks.indexOf('>', i)
          i = if (gt < 0) noBlocks.length else gt + 1
          sb.append(' ')
        case '&' =>
          val (d, next) = decodeEntity(noBlocks, i)
          sb.append(d); i = next
        case c => sb.append(c); i += 1
      }
    }
    // 6. collapse whitespace, trim
    val out = new StringBuilder(sb.length)
    var lastWs = true // leading ws trimmed
    var j = 0
    while (j < sb.length) {
      val c = sb.charAt(j)
      val ws = c == ' ' || c == '\t' || c == '\n' || c == '\r'
      if (ws) { if (!lastWs) out.append(' '); lastWs = true }
      else { out.append(c); lastWs = false }
      j += 1
    }
    while (out.nonEmpty && out.charAt(out.length - 1) == ' ')
      out.setLength(out.length - 1)
    out.toString
  }

  /** All href targets of <a> tags, document order (duplicates kept). */
  def extractLinks(html: Array[Byte]): Seq[String] = {
    if (html == null) return Seq.empty
    val s = new String(html, StandardCharsets.UTF_8)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i >= 0 && i < s.length) {
      val a = indexOfIgnoreCase(s, "<a", i)
      if (a < 0) i = -1
      else {
        val gt = s.indexOf('>', a)
        val tagEnd = if (gt < 0) s.length else gt
        val h = indexOfIgnoreCase(s, "href=\"", a)
        if (h >= 0 && h < tagEnd) {
          val vStart = h + 6
          val vEnd = s.indexOf('"', vStart)
          if (vEnd >= 0) out += s.substring(vStart, vEnd)
        }
        i = tagEnd + 1
      }
    }
    out.toSeq
  }

  private val textUdf = udf(extractText _)
  private val linksUdf = udf(extractLinks _)

  /** Column form: html binary -> text string. */
  def textOf(html: Column): Column = textUdf(html)

  /** Column form: html binary -> array<string> of href targets. */
  def linksOf(html: Column): Column = linksUdf(html)
}
