package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions._

/** Text analysis for training-data pipelines: language ID, quality
  * scoring, token counting, fingerprinting. All pure column
  * expressions — every operator here stays inside whole-stage codegen
  * and scales linearly with no shuffle (per-row transforms) or one
  * map-side-combinable aggregation (corpus stats).
  */
object Text {

  /** Small per-language stopword lists for the n-gram/stopword
    * language-ID heuristic (public common-word lists). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "was"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "es", "por"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "est", "que"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "ein", "eine", "zu", "mit"),
    "zh" -> Seq("的", "了", "是", "在", "我", "有", "和", "就", "不", "人")
  )

  private val englishStop = stopwords("en")

  /** Per-document quality features: char length, word count, punct
    * ratio, stopword ratio, mean word length, uppercase ratio. */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val nChars = length(text)
    val nWords = size(toks)
    val nPunct = length(regexp_replace(text, "[^\\p{Punct}]", ""))
    val nUpper = length(regexp_replace(text, "[^A-Z]", ""))
    val nStop = size(filter(toks, t => t.isin(englishStop: _*)))
    Seq(
      "n_chars" -> nChars.cast("long"),
      "n_words" -> nWords.cast("long"),
      "punct_ratio" -> round(nPunct.cast("double") / greatest(nChars, lit(1)), 6),
      "stopword_ratio" -> round(nStop.cast("double") / greatest(nWords, lit(1)), 6),
      "mean_word_len" -> round(
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
          greatest(nWords, lit(1)), 6),
      "upper_ratio" -> round(nUpper.cast("double") / greatest(nChars, lit(1)), 6)
    )
  }

  /** Composite quality score in [0,1]: penalize extreme length, high
    * punctuation, low stopword density (heuristics standard in corpus
    * filtering, e.g. C4/Gopher-style rules). */
  def qualityScore(text: Column): Column = {
    val f = qualityFeatures(text).toMap
    val lenOk = when(f("n_words").between(5, 10000), 1.0).otherwise(0.0)
    val punctOk = when(f("punct_ratio") <= 0.2, 1.0).otherwise(0.0)
    val stopOk = when(f("stopword_ratio") >= 0.05, 1.0).otherwise(0.5)
    round((lenOk + punctOk + stopOk) / 3.0, 6)
  }

  /** Language ID by stopword-hit scoring: for each candidate language,
    * count tokens in its stopword list; argmax wins, ties broken by
    * language code, no hits ⇒ "und". Pure expressions (a static
    * candidate set unrolled into a greatest-of struct).
    *
    * NOTE: the per-language `filter(toks, …)` higher-order lambdas run
    * interpreted (outside whole-stage codegen) — fine for ad-hoc /
    * small use, but the corpus-scale variant is [[langIdDf]]
    * (explode → broadcast stopword join → count), which measured ~8×
    * faster at sf0.1 with identical output. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    // score struct per lang: (hits, negated code for tie-break) → max
    val scored = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(
        size(filter(toks, t => t.isin(words: _*))).as("hits"),
        lit(lang).as("lang")
      )
    }
    // greatest over structs orders by hits then lang desc; to break ties
    // by lang ASC, compare on (hits, reversed lang) — simpler: fold.
    val best = scored.reduceLeft { (a, b) =>
      when(b.getField("hits") > a.getField("hits"), b).otherwise(a)
    }
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Corpus-scale language ID: returns (idCol, lang_pred) for every
    * document. Same semantics as [[langId]] (stopword-hit argmax, ties
    * to the alphabetically-first language, no hits ⇒ "und") in the
    * shape that stays inside whole-stage codegen and scales:
    * explode tokens once, count hits per (doc, lang) through a
    * broadcast join against the tiny (token, lang) stopword table
    * (map-side combinable), argmax via `min(struct(-hits, lang))`,
    * then a left join back so hit-less documents keep a row. One
    * corpus shuffle on doc id; the stopword table (50 rows) is the
    * only broadcast. Replaces ~6 interpreted `filter(toks, …)` lambda
    * evaluations per row (the [[langId]] column form). */
  def langIdDf(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sp = docs.sparkSession
    import sp.implicits._
    val stopTable = stopwords.toSeq.sortBy(_._1)
      .flatMap { case (lang, ws) => ws.map(w => (w, lang)) }
      .toDF("tok", "lang")
    val tok = docs.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("tok"))
    val hits = tok.join(broadcast(stopTable), "tok")
      .groupBy("id", "lang").agg(count(lit(1)).as("hits"))
    // min over (−hits, lang) = max hits, ties to the first language
    val best = hits.groupBy("id")
      .agg(min(struct((-col("hits")).as("neg"), col("lang").as("lang"))).as("b"))
      .select(col("id"), col("b.lang").as("hit_lang"))
    docs.select(col(idCol).as("id")).join(best, Seq("id"), "left")
      .select(col("id").as(idCol), coalesce(col("hit_lang"), lit("und")).as("lang_pred"))
  }

  /** RE2-compatible redaction patterns (no lookarounds, no backrefs) —
    * the SAME regex strings run in Spark (Java regex) and the DuckDB
    * oracle (RE2), and for these greedy character-class patterns the
    * two engines match identically. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "\\+?[0-9][0-9() -]{6,}[0-9]"

  /** PII-style redaction for training-data hygiene: mask email
    * addresses and phone-number-ish digit runs with typed tags. Pure
    * codegen'd regexp_replace — per-row, no shuffle, linear at any
    * scale; patterns replace ALL occurrences. This is the scrub-before-
    * train step every corpus pipeline runs; swap/extend the pattern
    * list for production PII taxonomies. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(text, emailPattern, "<EMAIL>"),
      phonePattern, "<PHONE>")

  /** Text normalization for ingest hygiene: control characters
    * (C0 + DEL, the class that breaks tokenizers and TSV exports)
    * become spaces, whitespace runs collapse to one space, ends
    * trimmed. Pure codegen'd regexp per row — no shuffle, linear at
    * any scale. The character class is written out explicitly
    * (`\x00-\x1F\x7F` rather than `\p{Cntrl}`) so the SAME pattern
    * string runs identically in Java regex and RE2/DuckDB oracles. */
  def clean(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(text, "[\\x00-\\x1F\\x7F]", " "),
      "\\s{2,}", " "))

  /** C4/Gopher-style corpus quality FILTER: keep documents whose word
    * count lies in [minWords, maxWords] and whose (English) stopword
    * density reaches minStopRatio — the cheap-rule pass that culls
    * boilerplate/gibberish before any expensive dedup. A pure per-row
    * predicate: no shuffle, linear at any scale.
    *
    * Exactness note: the ratio test runs as `nStop >= minStopRatio *
    * nWords` — one IEEE product, bit-identical across engines — rather
    * than a rounded division, so the survivor set is oracle-exact. */
  def qualityFilter(docs: DataFrame, textCol: String = "text",
                    minWords: Int = 60, maxWords: Int = 10000,
                    minStopRatio: Double = 0.05): DataFrame = {
    val toks = tokens(col(textCol))
    val nWords = size(toks)
    val nStop = size(filter(toks, t => t.isin(englishStop: _*)))
    docs.filter(nWords.between(minWords, maxWords) &&
      nStop.cast("double") >= lit(minStopRatio) * nWords.cast("double"))
  }

  /** Context-window chunking: split each document into ~chunkTokens
    * token windows overlapping by `overlap` tokens (the step every
    * training/RAG pipeline runs between cleaning and tokenization).
    * Emits one row per (doc, chunk_idx) with the chunk text. Pure
    * codegen'd array expressions + posexplode — per-row work, no
    * shuffle; a short document yields exactly one (possibly short)
    * chunk, never zero. */
  def chunk(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text",
            chunkTokens: Int = 64, overlap: Int = 8): DataFrame = {
    require(chunkTokens > overlap && overlap >= 0,
      s"need chunkTokens > overlap >= 0, got $chunkTokens, $overlap")
    val step = chunkTokens - overlap
    val toks = tokens(col(textCol))
    val starts = sequence(lit(1), greatest(size(toks) - overlap, lit(1)), lit(step))
    docs.select(col(idCol),
        posexplode(transform(starts, st => concat_ws(" ", slice(toks, st, lit(chunkTokens))))))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "chunk_text")
  }

  /** Gopher-style repetition signals per document: `top_share` (the
    * most frequent token's share of all tokens — boilerplate/spam
    * marker) and `ttr` (type-token ratio, distinct/total — low means
    * repetitive). Corpus-scale shape: explode once, two map-side-
    * combinable keyed aggregations; the document text itself shuffles
    * never, only (id, token) pairs then (id, counts). */
  def repetitionDf(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    docs.select(col(idCol), explode(tokens(col(textCol))).as("__tok"))
      .groupBy(idCol, "__tok").agg(count(lit(1)).as("__c"))
      .groupBy(idCol)
      .agg(
        round(max("__c").cast("double") / sum("__c"), 6).as("top_share"),
        round(count(lit(1)).cast("double") / sum("__c"), 6).as("ttr"))

  /** Corpus-derived unigram language-model score per document: the
    * mean log-probability of the document's tokens under the corpus's
    * own unigram distribution — the classic cheap "KenLM-style"
    * fluency/quality proxy when no external LM is available (docs full
    * of corpus-rare tokens score low).
    *
    * Two-pass scale shape: (1) one explode → token-keyed count
    * aggregation builds the unigram table (vocabulary-sized, ≪
    * corpus); the corpus-total denominator is a 1-row aggregate
    * attached by broadcast; (2) the token stream joins the table on
    * the token key — a plain equi shuffle Catalyst can broadcast
    * whenever the vocabulary fits — and re-aggregates per document.
    * Document text itself never shuffles, only (id, token) pairs.
    *
    * The per-token ln() is IEEE-correct to 1 ulp on both engines and
    * the per-doc mean is order-dependent in its last ulp, so the score
    * is rounded to 4 per the repo float rule. */
  def lmScoreDf(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol), explode(tokens(col(textCol))).as("__tok"))
    val counts = toks.groupBy("__tok").agg(count(lit(1)).as("__c"))
    val total = counts.agg(sum("__c").as("__total"))
    val logp = counts.crossJoin(broadcast(total))
      .select(col("__tok"),
        log(col("__c").cast("double") / col("__total")).as("__logp"))
    toks.join(logp, "__tok")
      .groupBy(idCol)
      .agg(round(avg("__logp"), 4).as("lm_score"),
        count(lit(1)).as("n_tokens"))
  }

  /** Most-characteristic term per document — the TF-IDF keyword
    * extractor. Ranking is by the EXACT integer key (tf desc, df asc,
    * term asc) — the same ordering tf·ln(N/df) induces when scores
    * differ, but immune to the cross-engine 1-ulp ln() hazard: two
    * mathematically-equal scores reached via different (tf, df) pairs
    * (e.g. 4·ln(N/100) vs 2·ln(N/20) at N=500) can compare EITHER way
    * in floating point, so a float-ranked top-1 would be
    * engine-dependent precisely where it matters. The tf·idf value
    * itself is reported as an informational column, rounded to 4.
    *
    * Shape: explode → (doc, term) tf agg → term-keyed df agg
    * (vocabulary-sized) joined back on the term key → per-doc top-1
    * window. The window partitions by doc id — maximal parallelism,
    * no global sort. */
  def topTermDf(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    val tf = docs.select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("__n_docs"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(idCol)
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(dfreq, "term")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .crossJoin(broadcast(nDocs))
      .select(col(idCol), col("term").as("top_term"), col("tf"),
        round(col("tf") * log(col("__n_docs").cast("double") / col("df")), 4)
          .as("tfidf"))
  }

  /** BM25 relevance score of every document against a fixed term set —
    * the classic retrieval/quality-ranking primitive (Robertson-Spärck
    * Jones idf with the +1 floor, Okapi tf saturation). Emits one row
    * per document containing at least one query term: the summed score
    * plus the matched-term count.
    *
    * Corpus-scale shape: the term filter is a literal `isin` predicate
    * applied right after the explode (no join — the token stream
    * shrinks to query-term hits before anything shuffles); per-(doc,
    * term) tf and per-term df are map-side-combinable aggregations; df
    * (≤ |terms| rows) and the (N, avgdl) scalar attach by broadcast;
    * the doc-length side is corpus-sized and joins shuffle-merge on
    * the id key — only (id, dl) pairs move, never text.
    *
    * Cross-engine exactness: dl and the corpus token total are
    * integer-valued doubles, so avgdl is a single exact-sum division —
    * bit-identical; ln() carries the usual 1-ulp hazard and the
    * per-doc sum is order-dependent, so the score is rounded to 4
    * (repo float rule). */
  def bm25(docs: DataFrame, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75,
           idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val dl = docs.select(col(idCol), tokenCount(col(textCol)).cast("double").as("__dl"))
    val stats = dl.agg(count(lit(1)).cast("double").as("__n"), avg("__dl").as("__avgdl"))
    val tf = docs.select(col(idCol), explode(tokens(col(textCol))).as("__tok"))
      .filter(col("__tok").isin(terms: _*))
      .groupBy(idCol, "__tok").agg(count(lit(1)).cast("double").as("__tf"))
    val dfreq = tf.groupBy("__tok").agg(count(lit(1)).cast("double").as("__df"))
    tf.join(broadcast(dfreq), "__tok")
      .crossJoin(broadcast(stats))
      .join(dl.hint("shuffle_merge"), idCol)
      .withColumn("__idf",
        log(lit(1) + (col("__n") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5))))
      .withColumn("__term_score",
        col("__idf") * (col("__tf") * (lit(k1) + lit(1))) /
          (col("__tf") + lit(k1) * (lit(1) - lit(b) + lit(b) * col("__dl") / col("__avgdl"))))
      .groupBy(idCol)
      .agg(round(sum("__term_score"), 4).as("bm25"),
        count(lit(1)).as("n_terms"))
  }

  /** Top-`v` vocabulary over the corpus: tokens ranked by (frequency
    * desc, token asc — the tie-break makes the cut deterministic),
    * assigned ids 1..v in rank order. Id 0 is reserved for OOV by
    * [[tokensToIds]].
    *
    * Scale shape: one explode → token-keyed count aggregation
    * (vocabulary-sized output, ≪ corpus), then orderBy+limit — a
    * TakeOrdered, not a global sort. The id-assigning window IS a
    * single-partition sort, but it runs on ≤ v rows: a vocabulary is
    * small by contract (it must fit in every executor for the
    * broadcast tokenization join downstream). */
  def buildVocab(docs: DataFrame, v: Int,
                 textCol: String = "text"): DataFrame = {
    require(v > 0, s"vocab size must be positive, got $v")
    val ranked = docs.select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token").asc)
      .limit(v)
    ranked.withColumn("id",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("freq").desc, col("token").asc)))
  }

  /** Tokenize every document to its id sequence under `vocab` (a
    * (token, id) frame from [[buildVocab]]); out-of-vocabulary tokens
    * map to 0. Emits (id, token_ids array); documents with zero
    * tokens produce no row (posexplode of an empty array).
    *
    * Scale shape: posexplode → broadcast join on the token (the vocab
    * is small by contract), then ONE keyed shuffle on the doc id to
    * reassemble; ordering is restored via array_sort over (pos, id)
    * structs, never collect_list order. Document text never shuffles —
    * only (id, pos, token-id) triples. */
  def tokensToIds(docs: DataFrame, vocab: DataFrame,
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol), posexplode(tokens(col(textCol))).as(Seq("__pos", "token")))
      .join(broadcast(vocab.select(col("token"), col("id").as("__tid"))), Seq("token"), "left")
      .withColumn("__tid", coalesce(col("__tid"), lit(0)))
      .groupBy(idCol)
      .agg(
        transform(array_sort(collect_list(struct(col("__pos"), col("__tid")))),
          x => x("__tid")).as("token_ids"),
        sum(when(col("__tid") === 0, 1L).otherwise(0L)).as("n_oov"))

  /** Add all text-analysis columns to a documents dataframe.
    *
    * Language ID routes through the corpus-scale [[langIdDf]] join when
    * an `idCol` is present (the column-form [[langId]] runs ~8× slower
    * at corpus scale — interpreted lambdas); id-less frames fall back
    * to the column form with that documented trade-off. A pre-existing
    * `lang_pred` column is REPLACED (matching withColumn semantics);
    * rows whose id misses the join (null ids) read "und". Join-path
    * caveat: duplicate id values pool their token hits into one
    * prediction — dedupe ids first (or pass an id-less frame) if
    * per-row prediction on duplicate ids matters. */
  def analyze(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val t = col(textCol)
    val withFeats = qualityFeatures(t).foldLeft(docs) { case (d, (n, c)) =>
      d.withColumn(if (d.columns.contains(n)) s"f_$n" else n, c)
    }
    val base = withFeats
      .withColumn("quality_score", qualityScore(t))
      .withColumn("n_tokens", tokenCount(t))
      .withColumn("fingerprint", fingerprintMd5(t))
    if (docs.columns.contains(idCol))
      base.drop("lang_pred")
        .join(langIdDf(docs, idCol, textCol), Seq(idCol), "left")
        .withColumn("lang_pred", coalesce(col("lang_pred"), lit("und")))
    else
      base.withColumn("lang_pred", langId(t))
  }

  /** BPE merge training (Sennrich et al. 2016 §3, simplified): learn
    * `nMerges` byte-pair merges from the corpus word-frequency table —
    * each round counts adjacent symbol pairs (weighted by word
    * frequency), merges the most frequent pair (ties to the
    * lexicographically smallest), and rewrites the vocabulary.
    * Simplifications vs canonical BPE, both deterministic and
    * engine-identical: no end-of-word marker, and merge application is
    * plain left-to-right non-overlapping string replace (a run of 3+
    * identical symbols merges its first pair only per round, because
    * the replace consumes the shared separator — the same semantics in
    * Java and DuckDB, which is what makes the whole training loop
    * hash-oracle-able as unrolled SQL).
    *
    * Scale shape: the only corpus-sized stage is the word count (one
    * explode + keyed aggregation); every training round then runs on
    * the VOCABULARY (bounded by contract, like [[buildVocab]]) — one
    * pair aggregation + a 1-row argmax to the driver + one projection.
    * Symbols join on U+0001 (absent from any text the tokenizer
    * admits), so pair patterns cannot match inside multi-char
    * symbols. */
  def bpeTrain(docs: DataFrame, nMerges: Int = 6,
               textCol: String = "text"): DataFrame = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val SEP = "\u0001"
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs.select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    // Spark's regex split("") leaves a trailing "" element (Java
    // Pattern.split limit -1); DuckDB's string_split does not — drop
    // empties so both engines seed identical symbol strings
    var syms = words.select(array_join(
        filter(split(col("w"), ""), x => length(x) > 0), SEP).as("s"), col("cnt"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long)]()
    for (r <- 1 to nMerges) {
      val parts = split(col("s"), SEP)
      val best = syms
        .filter(size(parts) >= 2)
        .select(col("cnt"), explode(zip_with(
          slice(parts, lit(1), size(parts) - 1),
          slice(parts, lit(2), size(parts) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("cnt").as("total"))
        .orderBy(col("total").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) {
        graft.core.Lineage.release(syms)
        return merges.toSeq.toDF("rank", "left_sym", "right_sym", "merged", "pair_weight")
      }
      val (l, rr, total) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
      merges += ((r, l, rr, l + rr, total))
      val padded = concat(lit(SEP), col("s"), lit(SEP))
      val replaced = call_function("replace", padded,
        lit(SEP + l + SEP + rr + SEP), lit(SEP + l + rr + SEP))
      val next = syms.select(
          call_function("substring", replaced, lit(2), length(replaced) - 2).as("s"),
          col("cnt"))
        .localCheckpoint()
      graft.core.Lineage.release(syms)
      syms = next
    }
    graft.core.Lineage.release(syms)
    merges.toSeq.toDF("rank", "left_sym", "right_sym", "merged", "pair_weight")
  }

  /** Adjacent-bigram PMI (collocation / phrase mining): for every
    * bigram seen ≥ `minCount` times, `pmi = ln(n_ab · N / (n_a· ·
    * n_·b))` with bigram-based marginals (n_a· = bigrams starting
    * with a, n_·b = ending with b, N = total bigrams) — the standard
    * phrase-detection signal (word2vec's phrase pass, NLTK
    * collocations).
    *
    * Exactness: every count casts to double BEFORE multiplying —
    * counts are exact in double (< 2⁵³) and double products round
    * identically cross-engine, whereas the int64 product n_ab·N
    * overflows once N exceeds ~3·10⁹ bigrams (routine at corpus
    * scale) and, with ANSI off, would WRAP silently. Both engines
    * feed ln the same double; the result rounds to 6 dp for the libm
    * last-ulp difference — the [[lmScoreDf]] convention.
    *
    * Scale shape: one corpus explode → keyed (w1, w2) count (the
    * bigram table, vocabulary²-bounded ≪ corpus); marginals are two
    * aggregations OF THAT TABLE (not the corpus); N is a single-row
    * broadcast. The corpus text itself is read once and never
    * shuffles — only (doc, pos, token) triples move. */
  def pmi(docs: DataFrame, minCount: Long = 5L,
          idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__id").orderBy("__pos")
    val toks = docs.select(col(idCol).as("__id"),
      posexplode(tokens(col(textCol))).as(Seq("__pos", "w1")))
    val pairs = toks.withColumn("w2", lead("w1", 1).over(w))
      .filter(col("w2").isNotNull)
    val pc = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("n_ab"))
    val na = pc.groupBy("w1").agg(sum("n_ab").as("n_a"))
    val nb = pc.groupBy("w2").agg(sum("n_ab").as("n_b"))
    val tot = pc.agg(sum("n_ab").as("n_total"))
    pc.filter(col("n_ab") >= minCount)
      .join(na, "w1").join(nb, "w2")
      .crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("n_ab"),
        round(log((col("n_ab").cast("double") * col("n_total").cast("double")) /
          (col("n_a").cast("double") * col("n_b").cast("double"))), 6).as("pmi"))
  }

  /** Apply TRAINED BPE merges ([[bpeTrain]]'s output, in rank order)
    * to every document — the tokenizer-ENCODE step that follows
    * tokenizer training in an LLM pipeline. Greedy BPE encoding ≡
    * applying each merge rule to the symbol string in training-rank
    * order, so the encoder is a fixed chain of `nMerges` codegen'd
    * replace projections per token (no iteration state, no UDF); the
    * merge table is parameter-sized (nMerges rows) and inlined as
    * literals. Emits per doc the word/subword counts and an md5 of the
    * position-ordered encoded sequence — exact strings + exact ints,
    * so encoding replays verbatim in SQL.
    *
    * Scale shape: one explode of the token stream → per-row projection
    * chain → one keyed re-aggregation per doc (collect_list is bounded
    * by document length, the same contract as [[tokensToIds]]). */
  def bpeEncode(docs: DataFrame, merges: Seq[(String, String)],
                idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(merges.nonEmpty, "bpeEncode needs at least one trained merge")
    val SEP = "\u0001"
    val toks = docs.select(col(idCol),
      posexplode(tokens(col(textCol))).as(Seq("__pos", "w")))
    val sym0 = array_join(filter(split(col("w"), ""), x => length(x) > 0), SEP)
    val encoded = merges.foldLeft(sym0) { case (s, (l, r)) =>
      val padded = concat(lit(SEP), s, lit(SEP))
      val rep = call_function("replace", padded,
        lit(SEP + l + SEP + r + SEP), lit(SEP + l + r + SEP))
      call_function("substring", rep, lit(2), length(rep) - 2)
    }
    toks.withColumn("__enc", encoded)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"),
        sum(size(split(col("__enc"), SEP))).as("n_subwords"),
        md5(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("__pos"), col("__enc")))),
            x => x("__enc")))).as("enc_md5"))
  }

  /** Multinomial Naive Bayes text classifier, trained and applied in
    * one relational pipeline (the classic quality/domain/language
    * tagger a curation pipeline runs before sampling): class priors
    * `ln(n_c/N)` + add-1-smoothed token likelihoods
    * `ln((cnt(t,c)+1)/(tot_c+V))`, document score = prior + Σ_t
    * tf·logp, predicted = argmax with ties to the smallest label.
    *
    * Scale shape: training is two keyed aggregations over the exploded
    * token stream ((term, class) counts and per-class totals) — the
    * same family as tf-idf; the likelihood grid is vocab×classes and
    * joins the per-doc tf table on the TERM key (a keyed shuffle, not
    * a broadcast, so a 100 M-term vocab still flows); scoring is one
    * (doc, class) aggregation and the argmax is a single min-struct —
    * no windows over the corpus.
    *
    * Determinism: priors and likelihoods are 1-2-op IEEE chains over
    * exact integer counts (bit-identical cross-engine, unrounded); the
    * per-document Σ tf·logp is an aggregate sum → rounded to 4 dp
    * BEFORE the argmax, ties broken by label — so train AND predict
    * replay exactly in SQL. */
  def naiveBayes(docs: DataFrame, labelCol: String,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol).as("__id"), col(labelCol).as("__lbl"),
      explode(tokens(col(textCol))).as("term"))
    val tf = toks.groupBy("__id", "term").agg(count(lit(1)).as("tf"))
    val classTerm = toks.groupBy(col("__lbl").as("cls"), col("term"))
      .agg(count(lit(1)).as("cnt"))
    val classTot = toks.groupBy(col("__lbl").as("cls"))
      .agg(count(lit(1)).as("tot"))
    val vocabN = toks.select("term").distinct().agg(count(lit(1)).as("v"))
    val nDocs = docs.agg(count(lit(1)).as("n_all"))
    val priors = docs.groupBy(col(labelCol).as("cls"))
      .agg(count(lit(1)).as("nd"))
      .crossJoin(broadcast(nDocs))
      .select(col("cls"),
        log(col("nd").cast("double") / col("n_all").cast("double")).as("prior"))
    // full vocab × class grid so unseen (term, class) pairs get the
    // smoothed floor instead of silently dropping out of the sum
    val grid = toks.select("term").distinct()
      .crossJoin(classTot)
      .join(classTerm, Seq("term", "cls"), "left")
      .crossJoin(broadcast(vocabN))
      .select(col("term"), col("cls"),
        log((coalesce(col("cnt"), lit(0L)) + lit(1L)).cast("double") /
          (col("tot") + col("v")).cast("double")).as("logp"))
    val scored = tf.join(grid, Seq("term"))
      .groupBy(col("__id"), col("cls"))
      .agg(sum(col("tf").cast("double") * col("logp")).as("s"))
      .join(priors, Seq("cls"))
      .select(col("__id"), col("cls"),
        round(col("s") + col("prior"), 4).as("score"))
    val best = scored.groupBy("__id")
      .agg(min(struct((-col("score")).as("neg"), col("cls").as("c"),
        col("score").as("sc"))).as("b"))
      .select(col("__id"), col("b.c").as("predicted"), col("b.sc").as("score"))
    docs.select(col(idCol), col(labelCol))
      .join(best, col(idCol) === col("__id"))
      .select(col(idCol), col(labelCol), col("predicted"), col("score"))
  }
}
