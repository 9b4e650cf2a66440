package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables
import graft.core.Det._

/** SURVEY.md §2.J — text analysis over `documents.text` (space-separated
  * lowercase words, measured in FIXTURES.md).
  *
  * Scale posture: tokenization and n-grams are pure projections (no
  * shuffle); word-count/TF-IDF shuffle once on the term key with map-side
  * partial aggregation; the doc-pair Jaccard is explicitly bounded to a
  * config-sized candidate set — at 100 TB the pair generation is the
  * LSH path (k6), never a cross join.
  */
object TextOps extends QueryPack {
  import QueryDef._

  private val stopwords = Seq("data", "table", "value", "row")

  /** Shared tokenizer (J1): lower + split on single space. */
  private[queries] def tokens(df: DataFrame): DataFrame =
    df.withColumn("toks", split(lower(col("text")), " "))

  /** §2.J1 — tokenize. */
  val j1: QueryDef = m(
    "j1_tokenize",
    """SELECT doc_id, array_to_string(string_split(lower(text), ' '), '|') AS toks,
      |  len(string_split(lower(text), ' ')) AS n_toks
      |FROM documents ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    tokens(Tables.documents(spark, dir))
      .select(col("doc_id"), array_join(col("toks"), "|").as("toks"),
        size(col("toks")).cast(LongType).as("n_toks"))
      .orderBy(col("doc_id"))
  }

  /** §2.J2 — stopword removal. filter() (not array_except) so duplicate
    * non-stopwords survive — array_except would dedup. */
  val j2: QueryDef = m(
    "j2_stopwords",
    s"""SELECT doc_id,
       |  coalesce(array_to_string(list_filter(string_split(lower(text), ' '),
       |    t -> t NOT IN (${stopwords.map(s => s"'$s'").mkString(",")})), '|'), '') AS kept,
       |  len(list_filter(string_split(lower(text), ' '),
       |    t -> t NOT IN (${stopwords.map(s => s"'$s'").mkString(",")}))) AS n_kept
       |FROM documents ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val stopArr = array(stopwords.map(lit): _*)
    tokens(Tables.documents(spark, dir))
      .withColumn("kept", filter(col("toks"), t => !array_contains(stopArr, t)))
      .select(col("doc_id"), array_join(col("kept"), "|").as("kept"),
        size(col("kept")).cast(LongType).as("n_kept"))
      .orderBy(col("doc_id"))
  }

  /** §2.J3 — corpus word count (explode → hash agg, map-side combined). */
  val j3: QueryDef = m(
    "j3_word_count",
    """SELECT word, COUNT(*) AS n
      |FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
      |GROUP BY word ORDER BY word""".stripMargin) { (spark, dir) =>
    tokens(Tables.documents(spark, dir))
      .select(explode(col("toks")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .orderBy(col("word"))
  }

  /** §2.J4 — n-grams (trigrams) as an array per doc; guarded for short
    * docs (sequence() would run DESCENDING for size < n — measured). */
  val j4: QueryDef = m(
    "j4_ngrams",
    """SELECT doc_id,
      |  coalesce(array_to_string(list_transform(range(1, len(toks) - 3 + 2),
      |    i -> array_to_string(list_slice(toks, i, i + 2), ' ')), '|'), '') AS trigrams
      |FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents)
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    tokens(Tables.documents(spark, dir))
      .withColumn("trigrams",
        when(size(col("toks")) >= 3,
          expr("transform(sequence(1, size(toks) - 2), i -> concat_ws(' ', slice(toks, i, 3)))"))
          .otherwise(array().cast(ArrayType(StringType))))
      .select(col("doc_id"), array_join(col("trigrams"), "|").as("trigrams"))
      .orderBy(col("doc_id"))
  }

  /** Generic TF-IDF over any (id, token-array) frame — the engine behind
    * j5 and the YAML `tfidf` op, where the id/token columns come from
    * config. tf = term count in doc; idf = ln(N/df); score at 6 dp
    * (D-rule 7; ln is libm-rounded on both engines — absorbed). Shape:
    * two map-side-combined aggregates shuffling on (id, term) / term,
    * one join on the term key, and the corpus size N as a broadcast
    * 1-row aggregate — no driver action at build time. */
  def tfidfOf(df: DataFrame, id: String, toks: String): DataFrame = {
    val terms = df.select(col(id), explode(col(toks)).as("term"))
    val tf = terms.groupBy(col(id), col("term")).agg(count(lit(1)).as("tf"))
    val idf = terms.groupBy(col("term")).agg(countDistinct(col(id)).as("df"))
    val n = df.agg(count(lit(1)).cast(DoubleType).as("n"))
    tf.join(idf, "term")
      .crossJoin(broadcast(n))
      .select(col(id), col("term"), col("tf"),
        round(col("tf") * log(col("n") / col("df")), 6).as("score"))
  }

  /** §2.J5 — TF-IDF: tf = term count in doc; idf = ln(N/df); score at
    * 6 dp (D-rule 7; ln is libm-rounded on both engines — absorbed). */
  val j5: QueryDef = m(
    "j5_tfidf",
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
      |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term),
      |n AS (SELECT COUNT(*) AS n FROM documents)
      |SELECT tf.doc_id, tf.term, tf.tf,
      |  ROUND(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 6) AS score
      |FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
      |ORDER BY tf.doc_id, tf.term""".stripMargin) { (spark, dir) =>
    tfidfOf(tokens(Tables.documents(spark, dir)), "doc_id", "toks")
      .orderBy(col("doc_id"), col("term"))
  }

  /** §2.J6 — pairwise Jaccard over a bounded candidate set (doc_id < 40).
    * Token SETS: both sides dedup; DuckDB list_distinct reorders, so both
    * sides sort before set ops. Scale path: candidates come from K6 LSH
    * buckets, not a cross join. */
  val j6: QueryDef = m(
    "j6_jaccard",
    """WITH d AS (SELECT doc_id, list_sort(list_distinct(string_split(lower(text), ' '))) AS ts
      |  FROM documents WHERE doc_id < 40)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  ROUND(CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE)
      |    / len(list_distinct(list_concat(a.ts, b.ts))), 6) AS jaccard
      |FROM d a JOIN d b ON a.doc_id < b.doc_id
      |ORDER BY id_a, id_b""".stripMargin) { (spark, dir) =>
    val d = tokens(Tables.documents(spark, dir))
      .where(col("doc_id") < 40)
      .select(col("doc_id"), array_sort(array_distinct(col("toks"))).as("ts"))
    val a = d.toDF("id_a", "ts_a")
    val b = d.toDF("id_b", "ts_b")
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(size(array_intersect(col("ts_a"), col("ts_b"))).cast(DoubleType)
          / size(array_union(col("ts_a"), col("ts_b"))), 6).as("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** §2.J7 — document profiling per (lang, source): counts + exact decimal
    * length stats (quality-scoring building block). */
  val j7: QueryDef = m(
    "j7_doc_profile",
    s"""SELECT lang, source, COUNT(*) AS n_docs,
       |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
       |  ${oAvg2(s"SUM(${oDec2("n_chars")})", "COUNT(*)")} AS avg_chars,
       |  CAST(SUM(len(string_split(lower(text), ' '))) AS BIGINT) AS total_tokens
       |FROM documents
       |GROUP BY lang, source ORDER BY lang, source""".stripMargin) { (spark, dir) =>
    tokens(Tables.documents(spark, dir))
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        avg2(sum(dec2(col("n_chars"))), count(lit(1))).as("avg_chars"),
        sum(size(col("toks")).cast(LongType)).as("total_tokens"))
      .orderBy(col("lang"), col("source"))
  }

  /** Language-ID heuristic + quality score + token count + fingerprint —
    * the NS text-analysis ops beyond the oracle-checkable surface, shipped
    * as one M query (all components are plain SQL on both engines). */
  val j8: QueryDef = m(
    "j8_text_quality",
    """SELECT doc_id,
      |  len(string_split(text, ' ')) AS n_tokens,
      |  ROUND(CAST(length(replace(text, ' ', '')) AS DOUBLE)
      |    / len(string_split(text, ' ')), 6) AS avg_word_len,
      |  length(text) - length(replace(text, 'e', '')) AS n_e,
      |  CASE WHEN length(text) BETWEEN 100 AND 450
      |       AND len(string_split(text, ' ')) >= 10 THEN 1.0 ELSE 0.0 END AS quality,
      |  md5(text) AS fingerprint
      |FROM documents ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir)
      .withColumn("tk", split(col("text"), " "))
      .select(
        col("doc_id"),
        size(col("tk")).cast(LongType).as("n_tokens"),
        round(length(regexp_replace(col("text"), " ", "")).cast(DoubleType)
          / size(col("tk")), 6).as("avg_word_len"),
        (length(col("text")) - length(regexp_replace(col("text"), "e", "")))
          .cast(LongType).as("n_e"),
        when(length(col("text")).between(100, 450) && size(col("tk")) >= 10, 1.0)
          .otherwise(0.0).as("quality"),
        md5(col("text")).as("fingerprint"))
      .orderBy(col("doc_id"))
  }

  override def defs: Seq[QueryDef] = Seq(j1, j2, j3, j4, j5, j6, j7, j8)
}
