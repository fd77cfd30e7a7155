package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over the `documents`
  * table: tokenization, token counting, quality scoring, language-ID
  * heuristic, document fingerprinting.
  *
  * Everything is a codegen'd Column expression (no UDFs): at 100 TB these run
  * embarrassingly parallel inside the parquet scan stage with zero shuffles.
  * All counts are exact integers and all ratios single divisions of exact
  * integers, so results are bit-stable for the DuckDB oracle.
  */
object TextAnalysis {

  /** Whitespace tokenization, lowercased, distinct-preserving duplicates. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword token count: runs of letters, runs of digits, or single
    * non-alphanumeric symbols — the pre-tokenizer split most BPE vocabularies
    * use. Regex kept in the common subset of Java regex and RE2 so the oracle
    * matches.
    */
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0))).cast("long")

  /** Quality facets: char length, token count, mean token length (exact-int
    * division), punctuation count, stopword hit count + ratio.
    */
  def qualityFacets(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val stop = array(STOPWORDS_EN.map(lit): _*)
    df.withColumn("n_chars_m", length(t).cast("long"))
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_punct",
        size(regexp_extract_all(t, lit("[.,;:!?]"), lit(0))).cast("long"))
      .withColumn("n_stop",
        size(array_intersect(toks, stop)).cast("long"))
      .withColumn("mean_tok_len",
        (length(t).cast("long") - (size(toks).cast("long") - 1)).cast("double") /
          size(toks).cast("long"))
      .withColumn("stop_ratio",
        size(array_intersect(toks, stop)).cast("long").cast("double") /
          size(toks).cast("long"))
  }

  /** Language-ID by distinct marker-word hits per language; argmax with a
    * deterministic preference order (en > de > es > fr on ties). N-gram
    * heuristics degrade to marker tokens here because the corpus is
    * whitespace-tokenizable; the operator shape (per-doc scoring + argmax)
    * is the real one.
    */
  def langId(text: Column): Column = langIdFromToks(tokens(text))

  /** Word-marker language ID over an ALREADY-TOKENIZED array — the form
    * the code-switching detector needs (it scores document halves without
    * re-joining them); [[langId]] is this over `tokens(text)`. Tie-break
    * order en > de > es > fr is part of the contract (mirrored in every
    * oracle CASE).
    */
  def langIdFromToks(toks: Column): Column = {
    def score(words: Seq[String]): Column =
      size(array_intersect(toks, array(words.map(lit): _*)))
    val en = score(MARKERS("en")); val de = score(MARKERS("de"))
    val es = score(MARKERS("es")); val fr = score(MARKERS("fr"))
    when(en >= de && en >= es && en >= fr, "en")
      .when(de >= es && de >= fr, "de")
      .when(es >= fr, "es")
      .otherwise("fr")
  }

  /** Character-n-gram markers per language — the classic profile-overlap
    * language-ID heuristic, working at the SUBSTRING level so it needs no
    * tokenizer (robust to scripts without whitespace, unlike the
    * word-marker [[langId]]). Grams are space-padded where they mark word
    * boundaries. */
  val NGRAM_MARKERS: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", "ing "),
    "de" -> Seq(" der ", " und ", "sch"),
    "es" -> Seq(" el ", " que ", "ción"),
    "fr" -> Seq(" le ", " et ", "eux"))

  /** Language ID by character-n-gram occurrence counts: score(lang) =
    * Σ occurrences of its marker grams, counted via the replace-length
    * identity `(len(t) - len(replace(t, g, ''))) / len(g)` — pure scalar
    * expressions, whole-stage codegen, no tokenization. Ties break
    * en > de > es > fr like [[langId]]. Same honesty note as langId: the
    * synthetic corpus's text carries no real language signal, so the
    * corpus-level query pins determinism and shape; the crafted-sentence
    * unit test is where the heuristic's discrimination is asserted.
    */
  def langIdNgram(text: Column): Column = {
    val t = concat(lit(" "), lower(text), lit(" "))
    def occ(g: String): Column =
      ((length(t) - length(replace(t, lit(g), lit("")))) / g.length)
        .cast("long")
    def score(lang: String): Column =
      NGRAM_MARKERS(lang).map(occ).reduce(_ + _)
    val en = score("en"); val de = score("de")
    val es = score("es"); val fr = score("fr")
    when(en >= de && en >= es && en >= fr, "en")
      .when(de >= es && de >= fr, "de")
      .when(es >= fr, "es")
      .otherwise("fr")
  }

  /** Deterministic document fingerprint: md5 of whitespace-normalized
    * lowercase text. Identical in any engine with md5 (rolling-hash variants
    * live in Dedup.simhash).
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))

  /** HTML → text extraction — the first transform of every web-crawl
    * ingest (the corpus ships extracted text; real crawls ship markup).
    * Deterministic regex pipeline in the Java-regex/RE2 common subset so
    * the oracle matches byte-for-byte:
    *
    *   1. drop `<script>`/`<style>` blocks WITH their contents (lazy
    *      `(?s)` spans — tag-stripping alone would leak code/CSS as text);
    *   2. strip remaining tags to a space (block boundaries must separate
    *      words, not concatenate them);
    *   3. decode the named entities that survive extraction, `&amp;`
    *      strictly LAST (decoding it first would double-decode
    *      `&amp;lt;` into `<`);
    *   4. collapse whitespace, trim.
    *
    * A real deployment swaps in a DOM-aware extractor for malformed
    * markup; the regex ladder is the deterministic, cross-engine-exact
    * core with the same signature. Pure per-row codegen, zero shuffle.
    */
  def htmlToText(html: Column): Column = {
    val noScript =
      regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " ")
    val noStyle =
      regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]+>", " ")
    val decoded = replace(
      replace(
        replace(
          replace(
            replace(noTags, lit("&lt;"), lit("<")),
            lit("&gt;"), lit(">")),
          lit("&quot;"), lit("\"")),
        lit("&nbsp;"), lit(" ")),
      lit("&amp;"), lit("&"))
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** The Gopher/MassiveText document-heuristic metrics as ONE per-row
    * struct — the single definition shared by the rule-battery readout
    * (`x_filter_gopher`) and the quality classifier's seed label
    * (`x_quality_classifier`), so the two can never disagree on what a
    * "clean" document is (lockstep rule; the oracle twin is
    * Pipeline.gopherCtesSql). `n_wchars` uses the single-space-join
    * shortcut `length(text) − (n_words − 1)` — exact for this corpus;
    * `n_wchars_exact` (per-token length sum) rides alongside for
    * real-crawl ports. Pure per-row expressions, zero shuffle.
    */
  def gopherMetrics(text: Column, toks: Column): Column = struct(
    size(toks).cast("long").as("n_words"),
    (length(text) - (size(toks) - 1)).cast("long").as("n_wchars"),
    aggregate(transform(toks, x => length(x)), lit(0L), (acc, x) => acc + x)
      .as("n_wchars_exact"),
    (length(text) - length(regexp_replace(text, "#", ""))).cast("long")
      .as("n_hash"),
    (size(split(text, "\\.\\.\\.", -1)) - 1).cast("long").as("n_ellipsis"),
    size(filter(toks, x => x.rlike("[a-z]"))).cast("long").as("n_alpha"),
    size(array_intersect(array_distinct(toks),
      array(STOPWORDS_EN.map(w => lit(w)): _*))).cast("long").as("n_stop"))

  /** The Gopher rule verdicts over a [[gopherMetrics]] struct — thresholds
    * live HERE only (integer-exact cross-multiplied ratios, no floats).
    */
  def gopherFlags(g: Column): Column = {
    val okWc = g.getField("n_words").between(50L, 100000L)
    val okMl = g.getField("n_wchars") >= g.getField("n_words") * 3 &&
      g.getField("n_wchars") <= g.getField("n_words") * 10
    val okHash = g.getField("n_hash") * 10 <= g.getField("n_words")
    val okEll = g.getField("n_ellipsis") * 10 <= g.getField("n_words") * 3
    val okAl = g.getField("n_alpha") * 5 >= g.getField("n_words") * 4
    val okStop = g.getField("n_stop") >= 2
    struct(okWc.as("ok_word_count"), okMl.as("ok_mean_len"),
      okHash.as("ok_hash"), okEll.as("ok_ellipsis"), okAl.as("ok_alpha"),
      okStop.as("ok_stop"),
      (okWc && okMl && okHash && okEll && okAl && okStop).as("keep"))
  }

  /** The Unicode fold table: accented Latin → ASCII base letter,
    * typographic punctuation (curly quotes, en/em dashes, NBSP) → ASCII.
    * Built programmatically so from/to can never drift out of alignment;
    * the oracle SQL interpolates these SAME strings (lockstep rule).
    * Single-char→single-char only — the multi-char ellipsis fold lives in
    * [[foldUnicode]] as a replace.
    */
  private val foldPairs: Seq[(Char, Char)] = Seq(
    "àáâãäå" -> 'a', "èéêë" -> 'e', "ìíîï" -> 'i', "òóôõö" -> 'o',
    "ùúûü" -> 'u', "ýÿ" -> 'y', "ç" -> 'c', "ñ" -> 'n', "š" -> 's',
    "ž" -> 'z', "“”" -> '"', "‘’" -> '\'',
    "–—" -> '-', " " -> ' ')
    .flatMap { case (cs, to) => cs.map(_ -> to) }
  val UnicodeFoldFrom: String = foldPairs.map(_._1).mkString
  val UnicodeFoldTo: String = foldPairs.map(_._2).mkString

  /** Unicode normalization — the CCNet-style pre-LM cleanup: lowercase,
    * fold accented Latin to ASCII base letters, straighten typographic
    * punctuation (curly quotes, dashes, NBSP, ellipsis), collapse
    * whitespace. Everything outside the fold table (CJK, emoji) passes
    * through untouched — this is Latin-script canonicalization, not
    * transliteration. Idempotent (fold∘fold = fold, the spec law) and a
    * pure per-row codegen expression: zero shuffle, zero UDF. Both
    * engines' `translate`/`lower` are Unicode-aware over the BMP, so the
    * fold is engine-exact.
    */
  def foldUnicode(text: Column): Column =
    trim(regexp_replace(
      translate(regexp_replace(lower(text), "…", "..."),
        UnicodeFoldFrom, UnicodeFoldTo),
      "\\s+", " "))

  /** Seeded quality scoring — the GPT-3/LLaMA-style filter core: given a
    * boolean seed label per document (any cheap heuristic), learn
    * per-token class affinities (r_e3 = ‰ of the token's corpus
    * occurrences inside seed docs) and score every document by the
    * multiplicity-weighted mean affinity of its tokens. The verdict
    * compares against the corpus-wide seed share of token MASS (the
    * mass-weighted mean score): pred_good ⟺ the doc's vocabulary leans
    * seed-ward — the integer-exact analog of "log-odds > 0". A fixed
    * absolute cut would be degenerate (affinities hover near the seed
    * mass share); the relative cut discriminates by construction.
    *
    * Output: (doc_id, seed, n_tok, score_e3, base_e3, pred_good).
    *
    * Scale (100 TB): token instances collapse to per-doc multiplicities
    * FIRST (one corpus-wide shuffle with map-side combine, persisted —
    * feeds the vocab model, the baseline scalar, and the scoring join);
    * the model is a vocab-sized equi-join, never broadcast-assumed (same
    * contract as the bigram LM); only the 1-row baseline broadcasts.
    * Seed docs score their own tokens — the standard self-training
    * caveat, fine for a corpus-relative ranking.
    */
  def seedAffinityScores(df: DataFrame, idCol: String, textCol: String,
                         seedCol: String): DataFrame = {
    val dt = seedMultiplicities(df, idCol, textCol, seedCol)
    dt.join(seedAffinityVocab(dt), "tok")
      .groupBy("doc_id", "seed")
      .agg(sum(col("m")).as("n_tok"),
        expr("sum(m * r_e3) div sum(m)").as("score_e3"))
      .crossJoin(broadcast(seedAffinityBase(dt)))
      .withColumn("pred_good", col("score_e3") > col("base_e3"))
  }

  /** Per-doc (doc_id, seed, tok, m) multiplicities — the ONE corpus pass
    * every seed-affinity consumer derives from (persisted: it feeds the
    * vocab model, the baseline scalar, and the scoring join — and the
    * streaming twin trains from the same frame).
    */
  def seedMultiplicities(df: DataFrame, idCol: String, textCol: String,
                         seedCol: String): DataFrame =
    CacheRegistry.register(df
      .select(col(idCol).as("doc_id"), col(seedCol).as("seed"),
        explode(tokens(col(textCol))).as("tok"))
      .groupBy("doc_id", "seed", "tok").agg(count(lit(1)).as("m"))
      .persist())

  /** The affinity model (tok, r_e3) over [[seedMultiplicities]] output. */
  def seedAffinityVocab(dt: DataFrame): DataFrame =
    dt.groupBy("tok").agg(
      sum(col("m")).as("c_all"),
      sum(when(col("seed"), col("m")).otherwise(0L)).as("c_pos"))
      .select(col("tok"), expr("c_pos * 1000 div c_all").as("r_e3"))

  /** The 1-row verdict baseline (base_e3) over [[seedMultiplicities]]. */
  def seedAffinityBase(dt: DataFrame): DataFrame =
    dt.agg(expr("(sum(if(seed, m, 0L)) * 1000) div sum(m)").as("base_e3"))

  /** SFT chat-template assembly: the first `promptToks` whitespace tokens
    * become the user turn, the next ≤ `maxCompletion` the assistant turn,
    * rendered into a fixed template with a context budget of
    * promptToks + maxCompletion tokens and a truncation flag. Documents
    * too short to yield a non-trivial completion (< promptToks + 4
    * tokens) are dropped — a 1-token "completion" teaches nothing.
    * Output: (id, example, n_ctx, truncated). Case is PRESERVED (unlike
    * [[tokens]] — a chat example is surface text, not a feature), and the
    * whole operator is per-row array slicing: zero Exchange, pinned in
    * PlanAuditSpec.
    */
  def sftFormat(df: DataFrame, idCol: String, textCol: String,
                promptToks: Int = 12, maxCompletion: Int = 64): DataFrame = {
    val ctx = promptToks + maxCompletion
    df.select(col(idCol), split(col(textCol), "\\s+").as("toks"))
      .where(size(col("toks")) >= promptToks + 4)
      .select(col(idCol),
        concat(lit("<|user|>\n"),
          concat_ws(" ", slice(col("toks"), 1, promptToks)),
          lit("\n<|assistant|>\n"),
          concat_ws(" ", slice(col("toks"), promptToks + 1, maxCompletion)),
          lit("\n<|end|>")).as("example"),
        least(size(col("toks")).cast("long"), lit(ctx.toLong)).as("n_ctx"),
        (size(col("toks")) > ctx).as("truncated"))
  }

  val STOPWORDS_EN: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")

  val MARKERS: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "fr" -> Seq("le", "la", "et", "un", "est"))
}
