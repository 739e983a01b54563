package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded per-group top-k as a typed [[Aggregator]] — the one
  * aggregation the built-ins cannot express without sorting whole
  * groups: `row_number() OVER (PARTITION BY g ORDER BY s)` buffers and
  * sorts EVERY row of every group, while this aggregator's buffer
  * never holds more than k entries, partial-aggregates map-side
  * (each partition contributes at most k), and ships k rows per
  * group across the shuffle. At 100 TB × "top 5 per key" that is the
  * difference between shuffling the corpus and shuffling 5·|keys|
  * rows.
  *
  * Deliberately an Aggregator and not a Catalyst Expression: the
  * buffer is variable-length state (a bounded ordered list), which
  * the typed Aggregator encodes natively; a codegen'd Expression
  * buys nothing here because the cost is comparisons, not boxing —
  * and the repo rule "functions over UDFs" is about PER-ROW scalar
  * work, which this is not.
  *
  * Ordering: score descending, id ascending on ties — a total order,
  * so results are deterministic and oracle-checkable (the SQL twin is
  * the ROW_NUMBER window with the same ORDER BY).
  */
object TopK {

  /** One candidate row: a long score and a tie-breaking id. */
  final case class Entry(score: Long, id: Long)

  private val ord: Ordering[Entry] =
    Ordering.by[Entry, (Long, Long)](e => (-e.score, e.id))

  /** Insert into a k-bounded list kept sorted by [[ord]] — O(k) per
    * row with an early exit when the row cannot place.
    */
  private def insert(buf: List[Entry], e: Entry, k: Int): List[Entry] =
    if (buf.sizeIs >= k && ord.gteq(e, buf.last)) buf
    else {
      val (before, after) = buf.span(b => ord.lt(b, e))
      (before ::: e :: after).take(k)
    }

  final class TopKAggregator(k: Int)
      extends Aggregator[Entry, List[Entry], Seq[Entry]] {
    require(k > 0, s"k=$k must be positive")
    override def zero: List[Entry] = Nil
    override def reduce(buf: List[Entry], e: Entry): List[Entry] =
      insert(buf, e, k)
    override def merge(a: List[Entry], b: List[Entry]): List[Entry] =
      b.foldLeft(a)((acc, e) => insert(acc, e, k))
    override def finish(buf: List[Entry]): Seq[Entry] = buf
    override def bufferEncoder: Encoder[List[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Entry]]()
    override def outputEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
  }

  /** Column-API form: `topK(5)(scoreCol, idCol)` — the Product input
    * encoder flattens [[Entry]] into two BIGINT arguments — returning
    * an array of (score, id) structs, largest first.
    */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new TopKAggregator(k), Encoders.product[Entry])
}
