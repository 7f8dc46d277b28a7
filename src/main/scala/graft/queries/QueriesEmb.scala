package graft.queries

import graft.functions.{Multimodal, Similarity}
import org.apache.spark.sql.functions._

/** Similarity-search queries over `embeddings` (64-dim float vectors) and
  * multimodal plumbing over `documents`-as-media.
  *
  * Dot products are emitted as a fixed-order left-associated 64-term sum
  * in both engines (Spark's sequential `aggregate` fold == SQL's
  * left-associative `+` chain), so doubles match bit-for-bit.
  */
object QueriesEmb {

  private val Dim = 64

  /** a·b as an explicit left-assoc sum over array columns (1-based). */
  private def dotSql(a: String, b: String): String =
    (1 to Dim).map(i => s"(CAST($a[$i] AS DOUBLE) * CAST($b[$i] AS DOUBLE))")
      .mkString("(", " + ", ")")

  val defs: Seq[QDef] = Seq(

    // brute-force cosine top-k (every 50th vector queries the corpus)
    QDef("sim_cosine_topk",
      (s, dir) => {
        val emb = Q.table(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") % 50 === 0)
        Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 10)
      },
      Some {
        val dqq = dotSql("q.e", "q.e")
        val dcc = dotSql("c.e", "c.e")
        val dqc = dotSql("q.e", "c.e")
        s"""WITH q AS (SELECT vec_id AS query_id, embedding AS e FROM embeddings
           |           WHERE vec_id % 50 = 0),
           |c AS (SELECT vec_id AS match_id, embedding AS e FROM embeddings),
           |s AS (
           |  SELECT query_id, match_id,
           |    $dqc / (sqrt($dqq) * sqrt($dcc)) AS sim
           |  FROM c, q WHERE query_id <> match_id)
           |SELECT query_id, match_id, rank, round(sim, 6) + 0.0e0 AS sim FROM (
           |  SELECT query_id, match_id, sim,
           |    CAST(row_number() OVER (PARTITION BY query_id
           |      ORDER BY sim DESC, match_id ASC) AS INT) AS rank
           |  FROM s) r
           |WHERE rank <= 10""".stripMargin
      }),

    // random-hyperplane LSH bucket assignment (the ANN scale path) —
    // native codegen'd expression; quantized-integer hyperplane dots
    QDef("sim_lsh_buckets",
      (s, dir) => Q.table(s, dir, "embeddings").select(col("vec_id"),
        Similarity.lshBucket(col("embedding"), nPlanes = 12, dim = Dim).as("bucket")),
      Some(s"""SELECT vec_id, ${Similarity.lshBucketSql("embedding", 12, Dim)} AS bucket
              |FROM embeddings""".stripMargin)),

    // embedding-cosine near-dup pairs: LSH-bucket candidates (equi-join),
    // exact cosine verify — the dedup-family member over vectors; fully
    // oracle-checked (quantized-integer buckets + fixed-fold cosine)
    QDef("dd_embed_cosine",
      (s, dir) => Similarity.cosineNearDupPairs(Q.table(s, dir, "embeddings"),
        "vec_id", "embedding", tau = 0.3, nPlanes = 6, dim = Dim),
      Some {
        val dxy = dotSql("x.e", "y.e")
        val dxx = dotSql("x.e", "x.e")
        val dyy = dotSql("y.e", "y.e")
        s"""WITH b AS (SELECT vec_id AS id, embedding AS e,
           |  ${Similarity.lshBucketSql("embedding", 6, Dim)} AS bucket FROM embeddings)
           |SELECT x.id AS id_a, y.id AS id_b,
           |  round($dxy / (sqrt($dxx) * sqrt($dyy)), 6) AS cos
           |FROM b x JOIN b y ON x.bucket = y.bucket AND x.id < y.id
           |WHERE $dxy / (sqrt($dxx) * sqrt($dyy)) >= 0.3""".stripMargin
      }),

    // LSH-bucketed top-k. Round 2: fully oracle-checked — the quantized-
    // integer buckets are engine-portable, so the candidate set (and
    // therefore the approximate top-k itself) is deterministic SQL.
    // Recall vs brute force stays pinned by ScalaTest.
    QDef("sim_lsh_topk",
      (s, dir) => {
        val emb = Q.table(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") % 50 === 0)
        Similarity.lshTopK(emb, queries, "vec_id", "embedding", k = 10)
      },
      Some {
        val dqq = dotSql("q.e", "q.e")
        val dcc = dotSql("c.e", "c.e")
        val dqc = dotSql("q.e", "c.e")
        s"""WITH b AS (SELECT vec_id, embedding AS e,
           |  ${Similarity.lshBucketSql("embedding", 12, Dim)} AS bucket FROM embeddings),
           |q AS (SELECT vec_id AS query_id, e, bucket FROM b WHERE vec_id % 50 = 0),
           |s AS (
           |  SELECT q.query_id, c.vec_id AS match_id,
           |    $dqc / (sqrt($dqq) * sqrt($dcc)) AS sim
           |  FROM b c JOIN q ON c.bucket = q.bucket AND q.query_id <> c.vec_id)
           |SELECT query_id, match_id, rank, round(sim, 6) + 0.0e0 AS sim FROM (
           |  SELECT query_id, match_id, sim,
           |    CAST(row_number() OVER (PARTITION BY query_id
           |      ORDER BY sim DESC, match_id ASC) AS INT) AS rank
           |  FROM s) r
           |WHERE rank <= 10""".stripMargin
      }),

    // IVF-style ANN: map-side nearest-centroid assignment (native
    // expression, corpus never shuffles to find its list), queries probe
    // nProbe nearest lists, exact cosine re-rank — fully oracle-checked
    // (deterministic centroids = every 100th vector; fixed-fold cosines)
    QDef("sim_ivf_topk",
      (s, dir) => {
        val emb = Q.table(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") % 50 === 0)
        Similarity.ivfTopK(emb, queries, "vec_id", "embedding", k = 10,
          centroidEvery = 100L, nProbe = 2, dim = Dim)
      },
      Some {
        def cos(a: String, b: String) =
          s"(${dotSql(s"$a", s"$b")} / (sqrt(${dotSql(s"$a", s"$a")}) * sqrt(${dotSql(s"$b", s"$b")})))"
        s"""WITH cent AS (SELECT vec_id AS cent_id, embedding AS ce FROM embeddings
           |             WHERE vec_id % 100 = 0),
           |a AS (
           |  SELECT e.vec_id AS match_id, e.embedding AS me, c.cent_id,
           |    row_number() OVER (PARTITION BY e.vec_id
           |      ORDER BY ${cos("e.embedding", "c.ce")} DESC, c.cent_id ASC) AS rn
           |  FROM embeddings e, cent c),
           |assign AS (SELECT match_id, me, cent_id FROM a WHERE rn = 1),
           |qp AS (
           |  SELECT q.vec_id AS query_id, q.embedding AS qe, c.cent_id,
           |    row_number() OVER (PARTITION BY q.vec_id
           |      ORDER BY ${cos("q.embedding", "c.ce")} DESC, c.cent_id ASC) AS rn
           |  FROM embeddings q, cent c WHERE q.vec_id % 50 = 0),
           |probes AS (SELECT query_id, qe, cent_id FROM qp WHERE rn <= 2),
           |s AS (
           |  SELECT p.query_id, a.match_id, ${cos("p.qe", "a.me")} AS sim
           |  FROM probes p JOIN assign a ON p.cent_id = a.cent_id
           |  WHERE p.query_id <> a.match_id)
           |SELECT query_id, match_id, rank, round(sim, 6) + 0.0e0 AS sim FROM (
           |  SELECT query_id, match_id, sim,
           |    CAST(row_number() OVER (PARTITION BY query_id
           |      ORDER BY sim DESC, match_id ASC) AS INT) AS rank
           |  FROM s) r
           |WHERE rank <= 10""".stripMargin
      }),

    // multimodal metadata pass (no decode; payload = utf-8 bytes of text)
    QDef("mm_metadata",
      (s, dir) => Multimodal.metadata(Multimodal.documentsAsMedia(s, dir)),
      Some("""SELECT doc_id AS media_id,
             |  CASE WHEN doc_id % 3 = 0 THEN 'image'
             |       WHEN doc_id % 3 = 1 THEN 'audio'
             |       ELSE 'video' END AS kind,
             |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |  md5(text) AS checksum
             |FROM documents""".stripMargin)),

    // stubbed decode + featurize (schema/partitioning real, codec faked;
    // rows-only — no SQL equivalent of the per-partition decode)
    QDef("mm_features",
      (s, dir) => Multimodal.decodeAndFeaturize(Multimodal.documentsAsMedia(s, dir))
        .toDF().select(col("media_id"), col("kind"), col("n_bytes"),
          col("checksum"), col("width"), col("height")),
      None),

    // frame sampling: the one-to-many explode contract (stride, bound,
    // timestamps, frame sizes) is deterministic plumbing — oracle-checked
    // even though the codec is stubbed
    QDef("mm_frames",
      (s, dir) => Multimodal.sampleFrames(Multimodal.documentsAsMedia(s, dir),
          everyNth = 2, maxFrames = 3, fps = 25.0)
        .toDF().select(col("media_id"), col("frame_idx"), col("t_ms"),
          octet_length(col("frame")).as("n_frame_bytes")),
      Some("""WITH m AS (
             |  SELECT doc_id AS media_id, octet_length(encode(text)) AS len
             |  FROM documents WHERE doc_id % 3 = 2),
             |f AS (
             |  SELECT media_id, len,
             |    unnest(range(0, greatest(len // 256, 1), 2)) AS frame_idx
             |  FROM m)
             |SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
             |  CAST(round(frame_idx / 25.0 * 1000) AS BIGINT) AS t_ms,
             |  CAST(CASE WHEN len >= 256 THEN 256 ELSE len END AS INT) AS n_frame_bytes
             |FROM f
             |QUALIFY row_number() OVER (PARTITION BY media_id ORDER BY frame_idx) <= 3""".stripMargin))
  )
}
