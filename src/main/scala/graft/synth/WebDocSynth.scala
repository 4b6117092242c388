package graft.synth

import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic multi-line "web page" documents for the C4-rule
  * queries: the driver's `documents` table is single-line prose with
  * no punctuation, so every C4 line rule would degenerate on it.
  * Each doc is a pure function of (id, seed) — the Spark query and
  * the DuckDB oracle both read the SAME side-dumped parquet, the
  * synthesizer only has to be deterministic, not SQL-expressible.
  *
  * Line mix (drawn per line from a seeded RNG):
  *  - clean sentences (≥5 words, terminal '.', '!' or '?')   — kept
  *  - short exclamations (<5 words, punctuated)              — dropped (word rule)
  *  - navigation fragments (≥5 words, NO terminal punct)     — dropped (punct rule)
  *  - "enable javascript…" notices (punctuated, ≥5 words)    — dropped (js rule)
  * Page-level poison, each on a small fraction of docs: a
  * "lorem ipsum" filler line, a code line with '{', a spam line
  * with a blocklist word — pages carrying any of them fail c4_pass,
  * as do pages whose kept lines total fewer than 3 sentences.
  */
object WebDocSynth {

  final case class WebDoc(doc_id: String, url: String, text: String)

  private def mix(z0: Long): Long = graft.codec.Hash.splitmix64(z0)

  private val subjects = Array("The scheduler", "Our planner", "The optimizer",
    "A worker node", "The shuffle service", "Every executor")
  private val verbs = Array("rewrites", "partitions", "compresses",
    "streams", "validates", "indexes")
  private val objects = Array("the token blocks without spilling",
    "each columnar batch in place", "the sorted run files overnight",
    "every incoming record exactly once", "the dictionary pages lazily",
    "the skewed buckets after salting")
  private val navWords = Array("home about contact privacy terms sitemap",
    "previous next first last page archive",
    "share tweet like follow subscribe comment")

  private def cleanLine(rng: scala.util.Random): String = {
    val punct = ".!?".charAt(rng.nextInt(3))
    s"${subjects(rng.nextInt(subjects.length))} ${verbs(rng.nextInt(verbs.length))} " +
      s"${objects(rng.nextInt(objects.length))}$punct"
  }

  def doc(id: Long, seed: Long): WebDoc = {
    val rng = new scala.util.Random(mix(seed ^ id))
    val nLines = 2 + rng.nextInt(9)
    val sb = new StringBuilder
    var i = 0
    while (i < nLines) {
      if (i > 0) sb.append('\n')
      rng.nextInt(10) match {
        case 0 => sb.append("Read more!") // short, punctuated
        case 1 => sb.append(navWords(rng.nextInt(navWords.length))) // no punct
        case 2 => sb.append("Please enable javascript to view this content.")
        case _ => sb.append(cleanLine(rng))
      }
      i += 1
    }
    // page-level poison on disjoint id residues so each flag fires
    // alone and combinations stay predictable
    if (id % 17 == 3) sb.append("\nLorem ipsum dolor sit amet, consectetur adipiscing elit.")
    if (id % 17 == 7) sb.append("\nfunction track() { emit(beacon); }")
    if (id % 17 == 11) sb.append("\nCheap viagra shipped overnight, order today and save big.")
    WebDoc(f"web-$id%08d", s"https://example.org/p/$id", sb.toString)
  }

  def dataset(spark: SparkSession, n: Int, seed: Long = 0xC4C4L): Dataset[WebDoc] = {
    import spark.implicits._
    spark.range(n).map(r => doc(r, seed))
  }
}
