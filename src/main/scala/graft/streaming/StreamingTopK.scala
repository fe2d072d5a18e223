package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Incremental top-k similarity search over a stream of vectors — the
  * streaming counterpart of `Similarity.bruteForceTopK`, in the spirit of
  * incremental/continuously-adaptive top-k search (EDBT '20, SIGMOD '20):
  * instead of re-scanning the corpus per query, each arriving vector is
  * scored against the (small, broadcast-by-closure) query set and folded
  * into per-query top-k state.
  *
  * State per query is EXACTLY k entries — independent of stream length —
  * so a 1000-executor deployment holds |queries| × k rows of state total.
  * Scoring uses the same double-precision sequential cosine as the batch
  * operators, so converged results equal the batch top-k.
  */
object StreamingTopK {

  final case class ScoredNeighbor(query_id: Long, vec_id: Long, cos: Double)
  final case class TopKState(query_id: Long, neighbors: Seq[ScoredNeighbor])

  private[streaming] def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** @param vectors streaming Dataset of (vec_id, embedding)
    * @param queries bounded query set, shipped via closure
    */
  def topK(
      spark: SparkSession,
      vectors: Dataset[(Long, Array[Float])],
      queries: Map[Long, Array[Float]],
      k: Int = 10): Dataset[TopKState] = {
    import spark.implicits._
    vectors
      .flatMap { case (vecId, emb) =>
        queries.iterator.collect {
          case (qId, qEmb) if qId != vecId =>
            ScoredNeighbor(qId, vecId, cosine(qEmb, emb))
        }
      }
      .groupByKey(_.query_id)
      .mapGroupsWithState[Seq[ScoredNeighbor], TopKState](GroupStateTimeout.NoTimeout) {
        case (qId, incoming, state: GroupState[Seq[ScoredNeighbor]]) =>
          val merged = (state.getOption.getOrElse(Seq.empty) ++ incoming)
            .sortBy(n => (-n.cos, n.vec_id))
            .take(k)
          state.update(merged)
          TopKState(qId, merged)
      }
  }
}
