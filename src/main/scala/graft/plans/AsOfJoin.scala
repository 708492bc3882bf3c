package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, LongType,
  TimestampNTZType, TimestampType}

/** AS-OF JOIN — "prevailing value at event time": for every left row
  * (key, t), attach the right row with the same key and the LARGEST right
  * time ≤ t (backward as-of, the price-at-trade-time semantics the
  * reference computes per-row with a correlated `ORDER BY ts DESC LIMIT 1`
  * subquery — api/routes/trades.js latest-price lookups and
  * core/prices.js:69-92's prevailing-reserve reads are this operator).
  * Forward ("next value at-or-after") and nearest (closer of the two,
  * ties to backward) directions ride the same single merge pass: the
  * forward candidate is simply the right cursor's head.
  *
  * Spark has no built-in as-of join, and the composable encodings are
  * wrong at scale: a lateral top-1 re-aggregates the right side per left
  * row, and the union+window trick materializes BOTH tables through one
  * window sort with every right column carried as nullable baggage. This
  * is the survey's ladder-(c) case — a whole-operator semantic gap — so it
  * is implemented as a first-class Catalyst citizen:
  *
  *   - [[AsOfJoinPlan]]: the logical node (resolved; output = left ++
  *     nullable right).
  *   - [[AsOfJoinStrategy]]: plans it to [[AsOfJoinExec]] (registered via
  *     `spark.experimental.extraStrategies` / [[GraftExtensions]]).
  *   - [[AsOfJoinExec]]: physical sort-merge as-of. Declares
  *     `ClusteredDistribution(keys)` on both children and `(keys…, time)`
  *     ascending child ordering, so EnsureRequirements provisions ONE
  *     hash shuffle per side plus spillable SortExecs — then each
  *     co-partition is merged in a single O(n+m) streaming pass holding
  *     exactly one retained right row. No per-left-row re-scan, no window
  *     buffering: the 100 TB plan is shuffle + external sort + merge,
  *     identical in shape to Spark's own sort-merge equi-join.
  *
  * Determinism: if several right rows tie on (key, time) the retained one
  * is sort-order dependent — dedupe the right side per (key, time) first
  * (the `j11` query does; AsOfJoinSpec pins the contract), or pass
  * `dedupeRight = true` to [[AsOf.join]] for the built-in
  * order-independent tiebreak.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    isLeftOuter: Boolean,
    toleranceMicros: Option[Long],
    direction: String = "backward") extends LogicalPlan with BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule: push deterministic left-only filter conjuncts through
  * [[AsOfJoinPlan]] into the left child. A custom logical node is
  * otherwise a pushdown barrier — Catalyst's PushDownPredicates only
  * rewrites node types it knows — so without this a `WHERE` on the probe
  * side sits above the join and the left scan reads everything. Left
  * conjuncts are safe for both left-outer and inner as-of (each left row
  * matches independently); right-side conjuncts must stay above (they
  * filter the OUTPUT, not the candidate set — dropping candidate rows
  * would change which row is "latest").
  */
object PushFilterThroughAsOfJoin
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.And
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, j: AsOfJoinPlan) =>
      val (pushable, rest) = splitConjunctivePredicates(cond).partition(p =>
        p.deterministic && p.references.subsetOf(j.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(pushable.reduce(And), j.left))
        if (rest.isEmpty) pushed else Filter(rest.reduce(And), pushed)
      }
  }
}

/** Planner rule: AsOfJoinPlan → a physical as-of join, cost-selected the
  * way Spark picks its own join strategies: if the right side's estimated
  * size clears `spark.sql.autoBroadcastJoinThreshold`, plan
  * [[BroadcastAsOfJoinExec]] (no shuffle or sort on EITHER side — the
  * dominant case, a huge fact stream against a small reference book);
  * otherwise the co-partitioned sort-merge [[AsOfJoinExec]].
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, outer, tol, dir) =>
      // The DataFrame API validates at construction; the SQL TVF path
      // reaches here with analyzer-resolved attributes instead — re-check
      // so a mistyped time column fails planning, not mid-task.
      require(AsOf.timeTypes.contains(lt.dataType) &&
          lt.dataType == rt.dataType,
        s"asof_join time columns must share an integral/timestamp type, " +
          s"got ${lt.dataType} vs ${rt.dataType}")
      lk.zip(rk).foreach { case (a, b) =>
        require(a.dataType == b.dataType,
          s"asof_join key type mismatch: ${a.dataType} vs ${b.dataType}")
      }
      val threshold =
        org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
      val rightSize = r.stats.sizeInBytes
      if (threshold >= 0 && rightSize >= 0 && rightSize <= threshold) {
        BroadcastAsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt,
          outer, tol, dir) :: Nil
      } else {
        AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, outer,
          tol, dir) :: Nil
      }
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    isLeftOuter: Boolean,
    toleranceMicros: Option[Long],
    direction: String = "backward") extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // Co-partition both sides on the equi-keys; one shuffle each at most.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // (keys…, time) ascending on both sides — SortExec spills, so a skewed
  // key is a slow partition, not an OOM.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  // The merge streams the left side through untouched.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  private def timeToLong(v: Any): Long = v match {
    case l: java.lang.Long => l
    case i: java.lang.Integer => i.toLong
    case other => throw new IllegalStateException(
      s"as-of time column must be long-backed, got ${other.getClass}")
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = leftKeys
    val rk = rightKeys
    val lt = leftTime
    val rt = rightTime
    val outer = isLeftOuter
    val tol = toleranceMicros
    val dir = direction
    val keyTypes = leftKeys.map(_.dataType)
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val lTimeEval = BindReferences.bindReference(lt, lOut)
      val rTimeEval = BindReferences.bindReference(rt, rOut)
      // Bind against nullable right attrs: the outer-join null row must go
      // through a null check even when the right column was non-nullable.
      val resultProj = UnsafeProjection.create(outAttrs,
        lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow

      // Forward stops the right cursor AT equal times (the head IS the
      // first row ≥ t); backward/nearest consume through them (the equal
      // row is the best ≤ t candidate).
      val consumeEqual = dir != "forward"
      val wantBackward = dir != "forward"  // backward or nearest
      val wantForward = dir != "backward"  // forward or nearest

      new Iterator[InternalRow] {
        // Current right cursor (copied: shuffle/sort iterators reuse rows).
        private var rRow: InternalRow = _
        private var rKey: InternalRow = _
        private var rTime: Long = _
        // Latest right row at-or-before the current left row, same key —
        // the backward candidate. The forward candidate is the cursor head.
        private var matched: InternalRow = _
        private var matchedKey: InternalRow = _
        private var matchedTime: Long = _
        private var out: InternalRow = _

        advanceRight()

        private def advanceRight(): Unit = {
          rRow = null
          while (rRow == null && rIter.hasNext) {
            val raw = rIter.next()
            val t = rTimeEval.eval(raw)
            if (t != null) { // null-time right rows can never match
              rRow = raw.copy()
              rKey = rKeyProj(rRow).copy()
              rTime = timeToLong(t)
            }
          }
        }

        private def computeNext(): InternalRow = {
          while (lIter.hasNext) {
            val l = lIter.next()
            val lKey = lKeyProj(l)
            val lt = lTimeEval.eval(l)
            // A match carried from the previous left row is only valid for
            // the same key.
            if (matched != null && keyOrd.compare(matchedKey, lKey) != 0) {
              matched = null
            }
            if (!lKey.anyNull && lt != null) {
              val lTime = timeToLong(lt)
              var advancing = true
              var headSameKey = false
              while (advancing && rRow != null) {
                val c = keyOrd.compare(rKey, lKey)
                if (c < 0) advanceRight() // stale key: skip
                else if (c == 0 &&
                    (rTime < lTime || (rTime == lTime && consumeEqual))) {
                  if (!rKey.anyNull) {
                    matched = rRow; matchedKey = rKey; matchedTime = rTime
                  }
                  advanceRight()
                } else { advancing = false; headSameKey = c == 0 }
              }
              val bOk = wantBackward && matched != null &&
                tol.forall(t => lTime - matchedTime <= t)
              val fOk = wantForward && headSameKey && !rKey.anyNull &&
                tol.forall(t => rTime - lTime <= t)
              // nearest: smaller distance wins, ties prefer backward
              val pick: InternalRow =
                if (bOk && fOk) {
                  if (lTime - matchedTime <= rTime - lTime) matched else rRow
                } else if (bOk) matched
                else if (fOk) rRow
                else null
              if (pick != null) return resultProj(joined(l, pick))
            }
            if (outer) return resultProj(joined(l, nullRight))
          }
          null
        }

        override def hasNext: Boolean = {
          if (out == null) out = computeNext()
          out != null
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          val r = out; out = null; r
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Broadcast as-of join: the right side is broadcast whole and indexed
  * per task as key → time-sorted rows; each left row answers with one
  * hash lookup + binary search (O(log m)). NO exchange and NO sort on
  * either side — the left stream's partitioning and ordering pass
  * through untouched, which is the plan you want when a 100 TB fact
  * stream looks up a reference book that fits in memory (the price-book
  * case). Tie rule matches the merge exec: among equal right times the
  * last in input order wins (both are sort-order dependent; dedupe the
  * right side for determinism).
  */
case class BroadcastAsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    isLeftOuter: Boolean,
    toleranceMicros: Option[Long],
    direction: String = "backward") extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution
      : Seq[org.apache.spark.sql.catalyst.plans.physical.Distribution] =
    org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution ::
      org.apache.spark.sql.catalyst.plans.physical.BroadcastDistribution(
        org.apache.spark.sql.catalyst.plans.physical.IdentityBroadcastMode) ::
      Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  private def timeToLong(v: Any): Long = v match {
    case l: java.lang.Long => l
    case i: java.lang.Integer => i.toLong
    case other => throw new IllegalStateException(
      s"as-of time column must be long-backed, got ${other.getClass}")
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = leftKeys
    val rk = rightKeys
    val lt = leftTime
    val rt = rightTime
    val outer = isLeftOuter
    val tol = toleranceMicros
    val dir = direction
    val outAttrs = output
    val bcRows = right.executeBroadcast[Array[InternalRow]]()
    // Cache tag: the same broadcast value can serve two different as-of
    // joins (ReuseExchange), so the index is keyed by its binding too.
    val idxTag = (rk.map(_.toString) :+ rt.toString).mkString(";")

    left.execute().mapPartitions { lIter =>
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val lTimeEval = BindReferences.bindReference(lt, lOut)
      val rTimeEval = BindReferences.bindReference(rt, rOut)
      val resultProj = UnsafeProjection.create(outAttrs,
        lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      val wantBackward = dir != "forward"
      val wantForward = dir != "backward"

      // key → (times ascending, rows in the same order); built ONCE per
      // (broadcast value, binding) per executor and shared by every task —
      // without the cache each task repeats the O(m log m) build + row
      // copies (ADVICE r5). Stable sort keeps input order among equal
      // times (same tie rule as the merge exec).
      val index = BroadcastAsOfJoinExec.indexFor(bcRows.value, idxTag) {
        val byKey = new java.util.HashMap[InternalRow,
          scala.collection.mutable.ArrayBuffer[(Long, InternalRow)]]()
        bcRows.value.foreach { raw =>
          val t = rTimeEval.eval(raw)
          val key = rKeyProj(raw)
          if (t != null && !key.anyNull) {
            var buf = byKey.get(key)
            if (buf == null) {
              buf = scala.collection.mutable.ArrayBuffer
                .empty[(Long, InternalRow)]
              byKey.put(key.copy(), buf)
            }
            buf += ((timeToLong(t), raw.copy()))
          }
        }
        val out = new java.util.HashMap[InternalRow,
          (Array[Long], Array[InternalRow])](byKey.size * 2)
        byKey.forEach { (k, buf) =>
          val sorted = buf.sortBy(_._1) // stable
          out.put(k, (sorted.map(_._1).toArray, sorted.map(_._2).toArray))
        }
        out
      }

      lIter.flatMap { l =>
        val lKey = lKeyProj(l)
        val ltv = lTimeEval.eval(l)
        var pick: InternalRow = null
        if (!lKey.anyNull && ltv != null) {
          val entry = index.get(lKey)
          if (entry != null) {
            val (times, rows) = entry
            val t = timeToLong(ltv)
            // bIdx = rightmost times(i) <= t (last equal-time row wins,
            // as in the merge exec); fIdx = leftmost times(i) >= t (first
            // equal-time row, as the merge's forward head).
            var lo = 0; var hi = times.length - 1; var bIdx = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (times(mid) <= t) { bIdx = mid; lo = mid + 1 }
              else hi = mid - 1
            }
            lo = 0; hi = times.length - 1; var fIdx = times.length
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (times(mid) >= t) { fIdx = mid; hi = mid - 1 }
              else lo = mid + 1
            }
            val bOk = wantBackward && bIdx >= 0 &&
              tol.forall(tl => t - times(bIdx) <= tl)
            val fOk = wantForward && fIdx < times.length &&
              tol.forall(tl => times(fIdx) - t <= tl)
            pick =
              if (bOk && fOk) {
                if (t - times(bIdx) <= times(fIdx) - t) rows(bIdx)
                else rows(fIdx)
              } else if (bOk) rows(bIdx)
              else if (fOk) rows(fIdx)
              else null
          }
        }
        if (pick != null) Iterator.single(resultProj(joined(l, pick)))
        else if (outer) Iterator.single(resultProj(joined(l, nullRight)))
        else Iterator.empty
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object BroadcastAsOfJoinExec {
  private type AsOfIndex =
    java.util.HashMap[InternalRow, (Array[Long], Array[InternalRow])]

  /** Executor-side index cache, weakly keyed by the broadcast value so
    * entries disappear when the broadcast is unpersisted/GC'd. The global
    * map lock is held only long enough to publish a per-(value, tag) lazy
    * holder; the index build itself synchronizes on that holder, so
    * first-wave tasks racing on the SAME index wait for one build while
    * unrelated as-of joins on the executor proceed (r6 review: building
    * under the global monitor serialized every concurrent as-of join's
    * first task). Index rows are task-private copies read-only after
    * publication — safe to share across task threads.
    */
  private val cache =
    new java.util.WeakHashMap[AnyRef, java.util.HashMap[String, Holder]]()

  /** `lazy val` synchronizes on this holder instance; the thunk is dropped
    * after the build so the holder (a WeakHashMap VALUE) does not strongly
    * reference the broadcast rows it captured (a WeakHashMap KEY), which
    * would pin the entry forever.
    */
  private final class Holder(@volatile private var thunk: () => AsOfIndex) {
    lazy val get: AsOfIndex = { val r = thunk(); thunk = null; r }
  }

  private[plans] def indexFor(rows: AnyRef, tag: String)
      (build: => AsOfIndex): AsOfIndex = {
    val holder = cache.synchronized {
      var inner = cache.get(rows)
      if (inner == null) {
        inner = new java.util.HashMap[String, Holder]()
        cache.put(rows, inner)
      }
      var h = inner.get(tag)
      if (h == null) {
        h = new Holder(() => build)
        inner.put(tag, h)
      }
      h
    }
    holder.get
  }
}

/** SQL table-function surface for the as-of join:
  *
  * {{{
  * SELECT * FROM asof_join(
  *   TABLE(trades), TABLE(prices),
  *   'pool_id', 'r_pool',        -- key columns ('a,b' for multi-key)
  *   'ts', 'r_ts'                -- time columns
  *   [, 'backward'|'forward'|'nearest'
  *   [, 'left'|'inner'
  *   [, tolerance]]])            -- max |Δtime| in the column's raw unit
  * }}}
  *
  * The TABLE(...) arguments arrive as
  * [[org.apache.spark.sql.catalyst.expressions.FunctionTableSubqueryArgumentExpression]]
  * (the same machinery SQL UDTFs use); the builder unwraps their plans
  * and emits an [[AsOfJoinPlan]] with unresolved key/time attributes,
  * which the analyzer's generic reference resolution binds against the
  * two children — so column names must be UNAMBIGUOUS across the two
  * tables (alias one side, as with any join's USING-less SQL). Planning
  * and pushdown then ride the exact same strategy + optimizer rule as
  * the DataFrame API. Registered via [[GraftExtensions]]
  * (`injectTableFunction`) or [[AsOf.ensureRegistered]].
  */
object AsOfTableFunction {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
  import org.apache.spark.sql.catalyst.expressions.{
    ExpressionInfo, FunctionTableSubqueryArgumentExpression, Literal}

  private def str(e: Expression, what: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String,
        org.apache.spark.sql.types.StringType) => v.toString
    case other => throw new IllegalArgumentException(
      s"asof_join: $what must be a string literal, got $other")
  }

  private def attrs(names: String): Seq[Expression] =
    names.split(",").toSeq.map(n => UnresolvedAttribute.quoted(n.trim))

  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Number, _) => v.longValue
    case other => throw new IllegalArgumentException(
      s"asof_join: $what must be an integer literal, got $other")
  }

  val builder: Seq[Expression] => LogicalPlan = (args: Seq[Expression]) => {
    require(args.length >= 6 && args.length <= 9,
      "asof_join(TABLE(left), TABLE(right), leftKeys, rightKeys, " +
        "leftTime, rightTime[, direction[, joinType[, tolerance]]])")
    val Seq(lPlan, rPlan) = args.take(2).map {
      case t: FunctionTableSubqueryArgumentExpression =>
        // A PARTITION BY / ORDER BY / WITH SINGLE PARTITION spec on the
        // TABLE(...) argument would be silently discarded here (the
        // operator derives its own distribution and per-key ordering), so
        // reject it loudly instead of letting it read as accepted (r6
        // review).
        if (t.hasRepartitioning || t.orderByExpressions.nonEmpty)
          throw new IllegalArgumentException(
            "asof_join: PARTITION BY / ORDER BY / WITH SINGLE PARTITION " +
              "on TABLE(...) arguments is not supported — the as-of join " +
              "derives its own distribution and ordering")
        t.plan
      case other => throw new IllegalArgumentException(
        s"asof_join: the first two arguments must be TABLE(...) references, got $other")
    }
    val lk = attrs(str(args(2), "leftKeys"))
    val rk = attrs(str(args(3), "rightKeys"))
    require(lk.nonEmpty && lk.length == rk.length,
      "asof_join needs one or more key column pairs")
    val dir = if (args.length > 6) str(args(6), "direction") else "backward"
    require(Set("backward", "forward", "nearest").contains(dir),
      s"asof_join direction must be backward/forward/nearest, got $dir")
    val outer = (if (args.length > 7) str(args(7), "joinType") else "left")
      .toLowerCase match {
        case "left" | "left_outer" => true
        case "inner" => false
        case other => throw new IllegalArgumentException(
          s"asof_join type must be left or inner, got $other")
      }
    val tol =
      if (args.length > 8) Some(longArg(args(8), "tolerance")) else None
    tol.foreach(t => require(t >= 0, s"asof_join tolerance must be >= 0, got $t"))
    AsOfJoinPlan(lPlan, rPlan, lk, rk,
      UnresolvedAttribute.quoted(str(args(4), "leftTime")),
      UnresolvedAttribute.quoted(str(args(5), "rightTime")),
      outer, tol, dir)
  }

  val injection: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan) =
    (FunctionIdentifier("asof_join"),
      new ExpressionInfo(classOf[AsOfJoinPlan].getName, "asof_join"),
      builder)
}

/** Public DataFrame API for the as-of join. */
object AsOf {
  private[plans] val timeTypes: Set[DataType] =
    Set(LongType, IntegerType, TimestampType, TimestampNTZType, DateType)

  /** Idempotently register the planner strategy + pushdown rule + SQL
    * table function on a session we did not build (the driver constructs
    * its own; `experimental.extraStrategies`/`extraOptimizations` and the
    * session registries are the public hooks for exactly this).
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    if (!spark.experimental.extraOptimizations
        .contains(PushFilterThroughAsOfJoin)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PushFilterThroughAsOfJoin
    }
    val (id, info, builder) = AsOfTableFunction.injection
    spark.sessionState.tableFunctionRegistry
      .registerFunction(id, info, builder)
  }

  /** Backward as-of join: for each left row, the right row with equal keys
    * and the largest `rightTimeCol` ≤ `leftTimeCol` (within `tolerance`
    * time units, if given). `joinType` ∈ {left, inner}. Key columns must
    * be type-aligned; time columns must be integral or timestamp typed.
    */
  def joinBackward(
      left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTimeCol: String, rightTimeCol: String,
      joinType: String = "left",
      tolerance: Option[Long] = None): DataFrame =
    join(left, right, leftKeys, rightKeys, leftTimeCol, rightTimeCol,
      "backward", joinType, tolerance)

  /** General as-of join. `direction`:
    *  - "backward": largest right time ≤ left time (prevailing value);
    *  - "forward":  smallest right time ≥ left time (next value);
    *  - "nearest":  whichever of the two is closer, ties to backward.
    * Tolerance bounds |Δtime|; `joinType` ∈ {left, inner}. One merge pass
    * either way — the forward candidate is the right cursor's head, the
    * backward candidate the last consumed same-key row.
    *
    * `skewSalt` > 1 is the hot-key escape hatch: every key's partition is
    * bounded by its own row count, so a token that takes 30% of all
    * trades pins one executor. Salting splits each LEFT key into
    * `skewSalt` deterministic sub-buckets (hash of keys+time) and
    * replicates the RIGHT side into all of them — right-side cost ×salt,
    * left side untouched, results identical (each left row still sees
    * every same-key right row). Use when a key's right-side history and
    * left-side traffic are both huge; plain AQE covers moderate skew.
    *
    * DETERMINISM: if the right side holds several rows with identical
    * (keys…, time), which of them a left row picks is input-order
    * dependent — and the strategy auto-switches between the merge and
    * broadcast execs on size stats, so the picked row can change as stats
    * change. Either dedupe the right side per (keys…, time) yourself, or
    * pass `dedupeRight = true` for the built-in order-independent
    * tiebreak: among equal-(keys,time) rows the one with the greatest
    * xxhash64 of the full row survives — a total order on row content,
    * so the result is identical under any input order, partitioning, or
    * physical strategy.
    */
  def join(
      left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTimeCol: String, rightTimeCol: String,
      direction: String,
      joinType: String = "left",
      tolerance: Option[Long] = None,
      skewSalt: Int = 1,
      dedupeRight: Boolean = false): DataFrame = {
    require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
      "as-of join needs one or more key column pairs")
    require(Set("backward", "forward", "nearest").contains(direction),
      s"as-of direction must be backward/forward/nearest, got $direction")
    require(skewSalt >= 1, s"skewSalt must be >= 1, got $skewSalt")
    if (dedupeRight) {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions.{row_number, struct, xxhash64}
      val rn = "__asof_dedupe_rn"
      val w = Window
        .partitionBy((rightKeys :+ rightTimeCol).map(col): _*)
        .orderBy(xxhash64(struct(right.columns.map(col): _*)).desc)
      val r2 = right.withColumn(rn, row_number().over(w))
        .filter(col(rn) === 1).drop(rn)
      return join(left, r2, leftKeys, rightKeys, leftTimeCol, rightTimeCol,
        direction, joinType, tolerance, skewSalt)
    }
    if (skewSalt > 1) {
      val salt = "__asof_salt"
      val l2 = left.withColumn(salt,
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.xxhash64(
            (leftKeys :+ leftTimeCol).map(col): _*),
          org.apache.spark.sql.functions.lit(skewSalt.toLong)).cast("int"))
      val r2 = right.withColumn(salt,
        org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.typedLit((0 until skewSalt).toList)))
      return join(l2, r2, leftKeys :+ salt, rightKeys :+ salt,
        leftTimeCol, rightTimeCol, direction, joinType, tolerance)
        .drop(salt)
    }
    val outer = joinType.toLowerCase match {
      case "left" | "left_outer" => true
      case "inner" => false
      case other => throw new IllegalArgumentException(
        s"as-of join type must be left or inner, got $other")
    }
    val spark = left.sparkSession
    ensureRegistered(spark)

    val lPlan = Bridge.analyzed(left)
    // Fresh exprIds on the right output (self-join safety): alias every
    // column through a Project, as Dataset.join's dedup does internally.
    val rPlan0 = Bridge.analyzed(right.select(right.columns.map(col): _*))
    val rPlan = Project(rPlan0.output.map(a => Alias(a, a.name)()), rPlan0)

    def attr(out: Seq[Attribute], name: String, side: String): Attribute =
      out.find(_.name == name).getOrElse(throw new IllegalArgumentException(
        s"column $name not found on $side side (${out.map(_.name)})"))

    val lk = leftKeys.map(attr(lPlan.output, _, "left"))
    val rk = rightKeys.map(attr(rPlan.output, _, "right"))
    lk.zip(rk).foreach { case (a, b) =>
      require(a.dataType == b.dataType,
        s"key type mismatch: ${a.name}:${a.dataType} vs ${b.name}:${b.dataType}")
    }
    val ltA = attr(lPlan.output, leftTimeCol, "left")
    val rtA = attr(rPlan.output, rightTimeCol, "right")
    Seq(ltA, rtA).foreach { a =>
      require(timeTypes.contains(a.dataType),
        s"as-of time column ${a.name} must be integral/timestamp, got ${a.dataType}")
    }
    // The execs compare the raw backing longs, whose unit differs per type
    // (micros for timestamps, days for dates, verbatim for ints/longs) —
    // mixed types would compare different units silently (ADVICE r5).
    require(ltA.dataType == rtA.dataType,
      s"as-of time columns must have the same type: " +
        s"${ltA.name}:${ltA.dataType} vs ${rtA.name}:${rtA.dataType}")
    Bridge.ofRows(spark,
      AsOfJoinPlan(lPlan, rPlan, lk, rk, ltA, rtA, outer, tolerance,
        direction))
  }
}
