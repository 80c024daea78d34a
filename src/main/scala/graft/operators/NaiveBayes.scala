package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classifier — the classic
  * counting-based classifier (Manning et al., IR book ch. 13) that LLM
  * data pipelines use for cheap corpus-scale labeling (fastText-style
  * language ID, quality filtering à la CCNet/GPT-3's classifier stage).
  * Training IS aggregation, so the whole thing is relational — no
  * gradient loop, no driver-side weights beyond two small frames.
  *
  * Add-one smoothing folded into algebra so scoring never needs the
  * zero-count (word, class) combinations:
  *
  *   score(d,c) = log(docs_c / D)                     — prior
  *              - n_d · log(tokens_c + V)             — denominator
  *              + Σ_w cnt(d,w) · log(k(w,c) + 1)      — seen words only
  *
  * because log((k+1)/(tokens_c+V)) splits and k=0 terms contribute
  * log 1 = 0 — the inner join drops exactly them.
  *
  * Scale shape: training is one token-count shuffle keyed (word, class)
  * plus a class-row rollup; the model is a vocab×C frame (equi-joined,
  * AQE-broadcast when small) and a C-row stats frame (always broadcast).
  * Scoring is one join + one (doc, class) aggregate; the per-doc argmax
  * is a C-row window. Nothing is ever quadratic and no weights live on
  * the driver.
  */
object NaiveBayes {

  /** Trained model: `classStats` (label, docs_c, tokens_c) — C rows;
    * `wordCounts` (word, label, k) — vocab×C rows at most; plus the two
    * corpus scalars the score formula needs. */
  final case class Model(classStats: DataFrame, wordCounts: DataFrame,
      corpusStats: DataFrame) {
    // scalar views for callers that want them; the SCORE path joins
    // `corpusStats` lazily instead, so training triggers no jobs.
    // ONE shared head(): reading both scalars must not rerun the
    // corpus-wide aggregation twice.
    private lazy val statsRow = corpusStats.head()
    lazy val vocabSize: Long = statsRow.getLong(0)
    lazy val totalDocs: Long = statsRow.getLong(1)
  }

  private def toks(docs: DataFrame, idCol: String, textCol: String) =
    docs.select(col(idCol).as("doc"),
      explode(split(trim(lower(col(textCol))), "\\s+")).as("word"))
      .filter(col("word") =!= "")

  /** The shared pre-aggregation spine: (doc, word, cnt). EVERYTHING
    * downstream — training counts, doc lengths, scoring hits — derives
    * from this frame, so the raw token stream is consumed exactly once
    * by one map-side-combining aggregate and never joins anything:
    * at 100 TB the label join and all later shuffles move distinct
    * (doc, word) pairs, not token instances (the texttail drill's
    * dw-first shape). */
  private def docWordCounts(tk: DataFrame): DataFrame =
    tk.groupBy("doc", "word").agg(count(lit(1)).as("cnt"))

  /** Train from labeled docs: two aggregates over one tokenization. */
  def train(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String): Model =
    trainDw(docWordCounts(toks(docs, idCol, textCol)), docs, idCol,
      labelCol)

  private def trainDw(dw: DataFrame, docs: DataFrame, idCol: String,
      labelCol: String): Model = {
    val t = dw
      .join(docs.select(col(idCol).as("doc"), col(labelCol).as("label")),
        "doc")
    val wc = t.groupBy("word", "label").agg(sum(col("cnt")).as("k"))
    val cs = t.groupBy("label").agg(sum(col("cnt")).as("tokens_c"))
      .join(docs.groupBy(col(labelCol).as("label"))
        .agg(count(lit(1)).as("docs_c")), "label")
    // 1-row (v, dn) frame instead of two eager count() actions — the
    // score path broadcasts it, so the whole train+predict chain stays
    // one lazy plan (two fewer jobs per confusion run)
    val stats = wc.agg(countDistinct(col("word")).as("v"))
      .crossJoin(docs.agg(count(lit(1)).as("dn")))
    Model(cs, wc.select("word", "label", "k"), stats)
  }

  /** Score + argmax: (doc, pred, score). Ties break toward the
    * lexicographically smallest label on both engines. */
  def predict(model: Model, docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    predictDw(model, docWordCounts(toks(docs, idCol, textCol)))

  private def predictDw(model: Model, dw: DataFrame): DataFrame = {
    val nd = dw.groupBy("doc").agg(sum("cnt").as("n_d"))
    val hits = dw.join(model.wordCounts, "word")
      .groupBy("doc", "label")
      .agg(sum(col("cnt") * log(col("k") + 1)).as("hit"))
    val scored = nd
      .crossJoin(broadcast(model.classStats))
      .crossJoin(broadcast(model.corpusStats))
      .join(hits, Seq("doc", "label"), "left")
      .withColumn("score",
        log(col("docs_c") / col("dn").cast("double"))
          - col("n_d") * log(col("tokens_c") + col("v").cast("double"))
          + coalesce(col("hit"), lit(0.0d)))
    // per-doc argmax as a hash agg (the LabelPropagation discipline):
    // min_by over (-score, label) = score desc, label asc — one partial+
    // final aggregate instead of a per-doc window sort
    scored.groupBy("doc")
      .agg(min_by(struct(col("label").as("pred"), col("score")),
        struct(-col("score"), col("label"))).as("best"))
      .select(col("doc"), col("best.pred").as("pred"),
        col("best.score").as("score"))
  }

  /** Train-and-score confusion matrix — the gate shape: how the learned
    * classifier labels its own training corpus (resubstitution), counted
    * per (true, predicted) cell. */
  def confusion(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String): DataFrame = {
    // resubstitution scores the SAME corpus it trained on: tokenize
    // and pre-aggregate ONCE, share the cached (doc, word, cnt) frame
    // between train and predict — it is the raw token stream's
    // distinct-pair compression, so the cache (and every downstream
    // shuffle) is the smaller of the two representations
    val dw = docWordCounts(toks(docs, idCol, textCol)).persist()
    val preds = predictDw(trainDw(dw, docs, idCol, labelCol), dw)
      .localCheckpoint() // doc-sized; frees the pair cache below
    dw.unpersist()
    docs.select(col(idCol).as("doc"), col(labelCol).as("truth"))
      .join(preds, "doc")
      .groupBy("truth", "pred").agg(count(lit(1)).as("n"))
  }
}
