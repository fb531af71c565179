package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM subword segmentation (Kudo, ACL 2018 — the SentencePiece
  * unigram model's Viterbi decode): segment every word into the
  * maximum-likelihood sequence of vocabulary pieces under a unigram piece
  * LM. The BPE family ([[Bpe]]) covers the merge-learned tokenizer; this
  * is the other production tokenizer family — segmentation as global
  * optimization rather than greedy merge replay.
  *
  * Model: the piece vocabulary is every character n-gram (n <= maxPieceLen)
  * of the corpus' words, scored by its corpus occurrence count (each
  * position counts, weighted by word frequency); p(piece) = cnt / total,
  * quantized to micronats (floor(ln * 1e6 + 0.5) — the perplexity-family
  * convention, engine-exact). Every n-gram of every word is in the vocab
  * by construction, so the DP is always feasible and needs no UNK piece.
  *
  * Decode per word: best(0) = 0,
  *   best(i) = max over l in 1..min(maxPieceLen, i) of
  *     best(i - l) + score(word[i-l+1 .. i])
  * ties resolve to the LONGEST last piece (the candidate struct compares
  * (score, l) lexicographically — deterministic in both engines).
  *
  * Scale shape (the [[Bpe.learn]] discipline): ONE corpus-sized shuffle
  * (the word histogram); the gram census, score join, and DP all run over
  * DISTINCT WORDS — type-level, model-sized. The DP itself is a row-local
  * `aggregate` fold over positions carrying (best[], ptr[]) — O(len *
  * maxPieceLen) per distinct word, no explode, no per-position shuffle.
  * The reconstruction walks ptr[] backward in a second fold. At 100 TB the
  * corpus is touched once; everything after is proportional to vocabulary.
  *
  * The reference engine has no tokenizer stage (`datacrawler.py` forwards
  * rows as-is); this is part of the training-data extension surface.
  */
object Unigram {

  /** Per-distinct-word Viterbi segmentation table:
    * (word, freq, n_pieces, score_micronats, segmented) — `segmented`
    * joins pieces with ' ' (words never contain spaces). */
  def viterbiSegment(df: DataFrame, textCol: String,
      maxPieceLen: Int = 4): DataFrame = {
    require(maxPieceLen >= 1)
    val wh = Caches.operatorPersist(Bpe.wordHistogram(df, textCol))

    // every n-gram occurrence of every distinct word, weighted by word
    // frequency — flatten(transform x transform) then ONE explode; the
    // census shuffle is gram-keyed and model-sized
    val gramsOf = flatten(transform(
      sequence(lit(1), length(col("word"))),
      i => transform(
        sequence(lit(1), least(lit(maxPieceLen),
          length(col("word")) - i + 1)),
        l => col("word").substr(i, l))))
    val census = wh.select(explode(gramsOf).as("piece"), col("freq"))
      .groupBy("piece").agg(sum("freq").as("cnt"))
    val tot = census.agg(sum(col("cnt")).cast("double").as("_t"))
    val scores = census.crossJoin(broadcast(tot))
      .select(col("piece"),
        floor(log(col("cnt").cast("double") / col("_t")) * lit(1e6)
          + lit(0.5)).cast("long").as("s"))

    // per-word score map: distinct grams only (map keys must be unique);
    // piece-keyed shuffle join — the score table is model-sized but can
    // exceed broadcast budgets on a real corpus, so let AQE pick
    val wordMap = wh.select(col("word"),
        explode(array_distinct(gramsOf)).as("piece"))
      .join(scores, "piece")
      .groupBy("word")
      .agg(map_from_entries(collect_list(struct(col("piece"), col("s"))))
        .as("m"))

    val n = length(col("word"))
    // the DP fold: acc carries best[] (1-indexed; best[1] = position 0)
    // and ptr[] (chosen last-piece length at each position). Candidates
    // compare (score, length) lexicographically — array_max picks the
    // max score, ties to the longest piece
    val dp = aggregate(sequence(lit(1), n),
      struct(array(lit(0L)).as("best"),
        array().cast("array<int>").as("ptr")),
      (acc, i) => {
        val cands = transform(
          sequence(lit(1), least(lit(maxPieceLen), i)),
          l => struct(
            (element_at(acc.getField("best"), i - l + 1) +
              element_at(col("m"), col("word").substr(i - l + 1, l)))
              .as("sc"),
            l.as("l")))
        val top = array_max(cands)
        struct(
          concat(acc.getField("best"),
            array(top.getField("sc"))).as("best"),
          concat(acc.getField("ptr"),
            array(top.getField("l").cast("int"))).as("ptr"))
      })

    // persist barrier before the walk (the no-CSE interpreted-HOF
    // discipline): the walk fold reads ptr[] once per step; without the
    // barrier a collapsed projection would re-run the whole DP per read.
    // The dp fold itself is projected ONCE into a struct column and its
    // two fields read in a SECOND select — interpreted HOFs get no CSE,
    // so reading dp.best and dp.ptr in one projection would run the
    // whole O(len*maxPieceLen) fold twice per distinct word
    val solved = Caches.operatorPersist(
      wh.join(wordMap, "word")
        .select(col("word"), col("freq"), dp.as("_dp"))
        .select(col("word"), col("freq"),
          element_at(col("_dp").getField("best"),
            length(col("word")) + 1).as("score_micronats"),
          col("_dp").getField("ptr").as("_ptr")))

    // backward walk: fold runs n times, each step either consumes one
    // piece (pos > 0) or is a no-op — n steps always suffice (every
    // piece is >= 1 char)
    val pos0 = length(col("word"))
    val pieces = aggregate(sequence(lit(1), pos0),
      struct(pos0.as("pos"), array().cast("array<string>").as("ps")),
      (acc, _) => {
        val p = acc.getField("pos")
        val l = element_at(col("_ptr"), p)
        when(p > 0,
          struct((p - l).as("pos"),
            concat(array(col("word").substr(p - l + 1, l)),
              acc.getField("ps")).as("ps")))
          .otherwise(acc)
      },
      acc => acc.getField("ps"))
    solved.select(col("word"), col("freq"),
      size(pieces).cast("int").as("n_pieces"),
      col("score_micronats"),
      array_join(pieces, " ").as("segmented"))
  }
}
