package graft

import org.apache.spark.sql.functions._
import graft.extract.Extract
import graft.sources.Synth
import graft.graph.VertexDict

/** Extractor + page-table pipeline: the `input_hint` invariant
  * "byte-identical extracted text per url" (FIXTURES.md §3). */
class ExtractSpec extends SparkSuite {
  import spark.implicits._

  test("extractText: tags, entities, script/style, whitespace — golden") {
    def x(s: String): String =
      Extract.extractText(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(x("<html><body><p>hello world</p></body></html>") == "hello world")
    assert(x("<body><p>a&amp;b &lt;c&gt; &quot;d&quot; &#39;e&#39; &#x41;</p></body>")
      == "a&b <c> \"d\" 'e' A")
    assert(x("<body><script>var x = '<p>no</p>';</script>yes</body>") == "yes")
    assert(x("<body><style>p { color: red }</style>text</body>") == "text")
    assert(x("<body>  a \n\t b   c  </body>") == "a b c")
    assert(x("<html><head><title>skip me</title></head><body>keep</body></html>") == "keep")
    assert(x("<p>no body tag</p>") == "no body tag")
    assert(x("<body><a href=\"http://x\"></a>between<a href=\"http://y\">anchor</a></body>")
      == "between anchor")
    assert(x("<body>café — über</body>") == "café — über")
  }

  test("extractLinks: href targets in document order") {
    val html = """<body><a href="u1"></a><a id="z" href="u2">t</a><a>none</a></body>"""
    assert(Extract.extractLinks(html.getBytes("UTF-8")) == Seq("u1", "u2"))
  }

  test("pages(60,5): extractor reproduces the text column byte-identically") {
    val pages = Synth.pages(spark, 60, 5)
    val mismatches = pages
      .select(Extract.textOf(col("html")).as("got"), col("text"))
      .filter(col("got") =!= col("text"))
      .count()
    assert(mismatches == 0)
    // byte-level (not just string equality): compare UTF-8 encodings
    val byteMism = pages
      .select(encode(Extract.textOf(col("html")), "UTF-8").as("g"),
        encode(col("text"), "UTF-8").as("w"))
      .filter(col("g") =!= col("w")).count()
    assert(byteMism == 0)
  }

  test("pages links == band edge structure") {
    val n = 60; val l = 5
    val got = Synth.pages(spark, n, l)
      .select(col("url").as("src_url"),
        explode(Extract.linksOf(col("html"))).as("dst_url"))
      .as[(String, String)].collect().toSet
    def u(i: Long) = f"https://example.org/page/$i%08d"
    val want = Oracles.bandEdges(n, l).map { case (s, d, _) => (u(s), u(d)) }.toSet
    assert(got == want)
  }

  test("vertex dictionary: dense deterministic ids; resolve rebuilds edges") {
    val n = 60; val l = 5
    val pages = Synth.pages(spark, n, l)
    val dict = VertexDict.fromUrls(pages.select("url"))
    val ids = dict.as[(String, Long)].collect().sortBy(_._2)
    assert(ids.map(_._2).toSeq == (0L until n).toSeq) // dense 0..n-1
    // urls zero-padded: lexicographic order == numeric order
    ids.foreach { case (url, id) => assert(url.endsWith(f"$id%08d")) }
    val links = pages.select(col("url").as("src_url"),
      explode(Extract.linksOf(col("html"))).as("dst_url"))
    val edges = VertexDict.resolve(links, dict)
      .select("src", "dst").as[(Long, Long)].collect().toSet
    assert(edges == Oracles.bandEdges(n, l).map(e => (e._1, e._2)).toSet)
  }

  test("page table schema matches BASELINE.json input_hint") {
    val schema = Synth.pages(spark, 3, 2).schema
    val want = Seq(
      ("url", "StringType"), ("warc_ts", "TimestampType"),
      ("html", "BinaryType"), ("text", "StringType"), ("lang", "StringType"))
    assert(schema.fields.map(f => (f.name, f.dataType.toString)).toSeq == want)
  }
}
