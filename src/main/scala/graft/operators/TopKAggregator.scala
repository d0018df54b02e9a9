package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded top-k per group as a typed UDAF (`Aggregator`).
  *
  * The window formulation (`row_number over (partition by g order by s)`)
  * sorts EVERY row of every group; this aggregator carries only a k-sized
  * buffer through the hash aggregate, so a group with 10⁹ rows costs
  * O(n log k) with map-side partial aggregation — the shape that survives
  * hot groups at corpus scale. Deterministic: ties on score break by
  * smaller id.
  */
object TopKAggregator {

  final case class Scored(id: Long, score: Double)

  /** Keeps the k largest (score, then smallest id) pairs. */
  final class TopK(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    private def prune(buf: Seq[Scored]): Seq[Scored] =
      buf.sortBy(s => (-s.score, s.id)).take(k)
    override def zero: Seq[Scored] = Seq.empty
    override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] =
      if (buf.size < k || a.score > buf.last.score ||
        (a.score == buf.last.score && a.id < buf.last.id))
        prune(buf :+ a)
      else buf
    override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] = prune(a ++ b)
    override def finish(buf: Seq[Scored]): Seq[Scored] = buf
    override def bufferEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Top-k rows per group: returns (group, id, score, rank) like the window
    * formulation, but via the bounded-buffer aggregate. */
  def topKPerGroup(df: DataFrame, groupCol: String, idCol: String,
                   scoreCol: String, k: Int): DataFrame = {
    val agg = udaf(new TopK(k), Encoders.product[Scored])
    df.groupBy(col(groupCol))
      .agg(agg(col(idCol), col(scoreCol).cast("double")).as("topk"))
      .select(col(groupCol), posexplode(col("topk")))
      .select(col(groupCol), (col("pos") + 1).as("rank"),
        col("col.id").as(idCol), col("col.score").as(scoreCol))
  }
}
