package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Native bounded top-k-per-group — a whole-operator Catalyst extension
  * (logical node + planner strategy + physical operator), the (c) rung of
  * the custom-operator ladder. Spark's own `row_number window + filter`
  * route SORTS every group (WindowGroupLimit prunes to k per partition but
  * still sort-based); this operator keeps a SIZE-K HEAP per group instead:
  *
  *   - partial stage (map side, any distribution): one pass over each
  *     input partition, a k-bounded heap per group key ⇒ at most k rows
  *     per (group × partition) ever reach the shuffle — the same
  *     volume-reduction as a partial aggregate, O(groups·k) memory,
  *     no sort of the input;
  *   - final stage declares `ClusteredDistribution(group)`, so
  *     EnsureRequirements inserts the hash exchange; the same heap pass
  *     over the co-located survivors yields the exact per-group top-k,
  *     emitted in rank order with a `rnk` column (1-based).
  *
  * Total O(n log k) comparisons vs sort's O(n log n); the heap holds the
  * k BEST rows with the worst at the top for O(log k) eviction. The
  * `order` must be a total order (tie-break column) for a deterministic
  * cut — same contract as operators/TopK. BOTH stages hold
  * O(groups-per-partition × k) rows in memory without spilling: the
  * partial stage caps its map (excess keys pass through to the shuffle
  * untrimmed), but the final stage must see every row of a group before
  * emitting, so its map is bounded only by the group cardinality landing
  * on the partition. This operator therefore targets bounded-cardinality
  * grouping (the q73 shape: groups ≪ rows); for near-unique group keys
  * use the salted declarative operators/TopK, whose window route
  * sort-spills instead of growing a heap per group (a production version
  * here would reuse Spark's spillable object map).
  */
case class TopKPerGroupPlan(
    group: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    rankAttr: AttributeReference = AttributeReference("rnk", LongType, nullable = false)())
  extends UnaryNode {
  require(k > 0, s"k must be positive: $k")
  // an empty group reaches ClusteredDistribution(Nil) and dies at planning
  // with an obscure EnsureRequirements error — reject it at construction
  require(group.nonEmpty, "group must be non-empty")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rnk is PRODUCED here, not read from the child — without this the
  // analyzer's missing-attribute check rejects the plan
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupPlan =
    copy(child = newChild)
}

/** Planner strategy: partial (pre-shuffle) + final heap passes. */
object TopKPerGroupStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(group, order, k, child, rankAttr) =>
      val partial = TopKPerGroupExec(group, order, k, rankAttr,
        org.apache.spark.sql.execution.PlanLater(child), partial = true)
      TopKPerGroupExec(group, order, k, rankAttr, partial, partial = false) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    group: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: SparkPlan,
    partial: Boolean)
  extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rankAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    if (partial) org.apache.spark.sql.catalyst.expressions.AttributeSet.empty
    else org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(group))

  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] =
    if (partial)
      Map("passThroughRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
        .createMetric(sparkContext, "rows passed through (partial group cap hit)"))
    else Map.empty

  override protected def doExecute(): RDD[InternalRow] = {
    val groupExprs = group
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    val isPartial = partial
    val finalOutput = output
    // Partial-stage memory bound: at most `maxGroups` heaps per input
    // partition — O(maxGroups × k) rows held, regardless of group-key
    // cardinality. Rows of keys beyond the cap PASS THROUGH unpruned,
    // which is still correct (the final stage recomputes the exact
    // per-group top-k from any superset of it); only the shuffle-volume
    // saving is lost for those keys. A high-cardinality group key thus
    // degrades to the plain shuffle instead of OOMing the executor.
    val maxGroups = conf.getConfString("spark.graft.topk.maxPartialGroups", "100000").toInt
    require(maxGroups > 0, s"spark.graft.topk.maxPartialGroups must be positive: $maxGroups")
    val passThroughMetric = if (isPartial) Some(longMetric("passThroughRows")) else None
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupExprs, childOutput)
      val ord = RowOrdering.create(sortOrder, childOutput)
      // max-heap under the ranking: head = worst of the current best-k,
      // so admission is one compare and eviction one O(log k) dequeue
      val heaps = new java.util.HashMap[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]()
      def newHeap(): scala.collection.mutable.PriorityQueue[InternalRow] =
        scala.collection.mutable.PriorityQueue.empty[InternalRow](
          (a: InternalRow, b: InternalRow) => ord.compare(a, b))
      if (isPartial) {
        // streaming pass: capped keys' rows are emitted immediately (no
        // buffering), pruned keys' survivors drain after input exhausts —
        // Iterator.++ takes its argument by name, so the heap drain is
        // built only once `pruned` has consumed the whole input
        val pruned = iter.flatMap { row =>
          val key = keyProj(row)
          var heap = heaps.get(key)
          if (heap == null && heaps.size() < maxGroups) {
            heap = newHeap()
            heaps.put(key.copy(), heap)
          }
          if (heap == null) {
            passThroughMetric.foreach(_.add(1L))
            Iterator.single[InternalRow](row)
          } else {
            if (heap.size < limit) heap += row.copy()
            else if (ord.compare(row, heap.head) < 0) { heap.dequeue(); heap += row.copy() }
            Iterator.empty
          }
        }
        pruned ++ {
          import scala.jdk.CollectionConverters._
          // order irrelevant before the final pass
          heaps.values().iterator().asScala.flatMap(_.iterator)
        }
      } else {
        // final stage: no cap needed because each heap is k-BOUNDED and the
        // map holds only the groups hashed to THIS partition. (The input is
        // NOT necessarily pre-pruned — keys past the partial-stage cap
        // arrive unpruned — but the heaps never hold more than k rows per
        // group regardless of input volume.)
        // downstream consumers require UnsafeRow — flatten the final
        // stage's JoinedRow(row, rank) through an identity unsafe projection
        val outProj = UnsafeProjection.create(finalOutput, finalOutput)
        while (iter.hasNext) {
          val row = iter.next()
          val key = keyProj(row)
          var heap = heaps.get(key)
          if (heap == null) {
            heap = newHeap()
            heaps.put(key.copy(), heap)
          }
          if (heap.size < limit) heap += row.copy()
          else if (ord.compare(row, heap.head) < 0) { heap.dequeue(); heap += row.copy() }
        }
        val entries = heaps.values().iterator()
        new Iterator[Iterator[InternalRow]] {
          override def hasNext: Boolean = entries.hasNext
          override def next(): Iterator[InternalRow] = {
            // worst-first drain reversed ⇒ rank order; append the 1-based rank
            val best = entries.next().dequeueAll.reverse
            best.iterator.zipWithIndex.map { case (row, i) =>
              outProj(new JoinedRow(row, new GenericInternalRow(Array[Any]((i + 1).toLong))))
            }
          }
        }.flatten
      }
    }, preservesPartitioning = true)
  }
}
