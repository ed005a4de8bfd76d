package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** SEQUENCE_MATCH / SEQUENCE_COUNT — the event-pattern aggregates of the
  * Doris/ClickHouse behavioral family (pattern syntax per the public
  * ClickHouse `sequenceMatch` docs), completing the trio started by
  * `graft_window_funnel`/`graft_retention` in [[FunnelAggs]].
  *
  * Supported pattern language:
  *   - `(?N)`      an event satisfying condition N (anchors; 1-based)
  *   - `.*`        any number of events (including none) between anchors
  *   - `(?t OP n)` seconds between the two ADJACENT anchors around it
  *                 satisfy `OP` ∈ {<, <=, >, >=, ==}; composes with an
  *                 implied `.*` (per ClickHouse semantics)
  * Without a separator, consecutive anchors must match CONSECUTIVE
  * events of the group's condition-relevant sequence (rows matching no
  * condition are skipped — also per the reference semantics).
  *
  * Matching is a set DP over the time-sorted events, one boolean set per
  * anchor: `set(k) = {q : cond_k(q) ∧ ∃p ∈ set(k−1) allowed(p,q)}`.
  * Because timestamps are sorted, a time window `t(q)−t(p) ≤ T` is
  * witnessed by the LATEST p (and `> T` by the EARLIEST), so each
  * transition evaluates with prefix min/max — O(anchors × events), no
  * backtracking. State (like the funnel's) is the group's relevant
  * (ts, condMask) pairs: mergeable by concatenation, O(matching events).
  */
object SequenceMatch {

  // ------------------------------------------------------------- pattern

  sealed trait Sep
  case object Adjacent extends Sep
  /** gap = `.*`; timeOp null means unconstrained. op: '<','≤','>','≥','=' */
  final case class Gap(op: Char = 0, seconds: Long = 0L) extends Sep

  /** (anchors, separators): anchors(i+1) relates to anchors(i) via seps(i). */
  final case class Pattern(anchors: IndexedSeq[Int], seps: IndexedSeq[Sep])

  private val AnchorRe = """\(\?(\d+)\)""".r
  private val TimeRe = """\(\?t\s*(<=|>=|==|<|>)\s*(\d+)\)""".r

  def parse(pattern: String): Pattern = {
    var rest = pattern.trim
    val anchors = ArrayBuffer.empty[Int]
    val seps = ArrayBuffer.empty[Sep]
    var pendingGap: Option[Gap] = None
    var sawAny = false
    while (rest.nonEmpty) {
      AnchorRe.findPrefixMatchOf(rest) match {
        case Some(m) =>
          val n = m.group(1).toInt
          require(n >= 1 && n <= 31, s"condition index out of range: (?$n)")
          if (sawAny) seps += pendingGap.getOrElse(Adjacent)
          else require(pendingGap.isEmpty || pendingGap.get.op == 0,
            "pattern cannot start with a time constraint")
          anchors += n
          pendingGap = None
          sawAny = true
          rest = rest.drop(m.matched.length)
        case None if rest.startsWith(".*") =>
          pendingGap = Some(pendingGap match {
            case Some(g) => g                       // `.*(?t…)` / `(?t…).*` merge
            case None => Gap()
          })
          rest = rest.drop(2)
        case None =>
          TimeRe.findPrefixMatchOf(rest) match {
            case Some(m) =>
              require(sawAny, "pattern cannot start with a time constraint")
              val op = m.group(1) match {
                case "<" => '<'; case "<=" => '≤'; case ">" => '>'
                case ">=" => '≥'; case "==" => '='
              }
              // a time constraint implies a gap (ClickHouse: `(?t>n)` sits
              // between anchors and composes with .*); a SECOND time
              // constraint between the same pair of anchors is rejected
              // loudly — silently keeping only the last one would match
              // sequences the written pattern excludes (e.g.
              // `(?1)(?t>2)(?t<5)(?2)` acting as just `(?t<5)`)
              require(!pendingGap.exists(_.op != 0),
                s"two time constraints between the same anchors at: '$rest' " +
                  "— only one (?t OP n) is allowed per separator")
              pendingGap = Some(Gap(op, m.group(2).toLong))
              rest = rest.drop(m.matched.length)
            case None =>
              throw new IllegalArgumentException(
                s"unsupported pattern at: '$rest' (supported: (?N) .* (?t OP n))")
          }
      }
    }
    require(anchors.nonEmpty, "pattern needs at least one (?N) anchor")
    require(pendingGap.isEmpty, "pattern cannot end with a separator")
    Pattern(anchors.toIndexedSeq, seps.toIndexedSeq)
  }

  // ------------------------------------------------------------ matching

  private def tsOk(op: Char, deltaMicros: Long, seconds: Long): Boolean = {
    val bound = seconds * 1000000L
    op match {
      case 0 => true
      case '<' => deltaMicros < bound
      case '≤' => deltaMicros <= bound
      case '>' => deltaMicros > bound
      case '≥' => deltaMicros >= bound
      case '=' => deltaMicros == bound
    }
  }

  /** earliest match END index (exclusive) of the full pattern over
    * events[from..), or -1. ts/mask must be (ts, mask)-sorted (the
    * canonical order [[sorted]] produces). Transitions require STRICTLY
    * increasing timestamps — equal-µs events cannot chain (same rule as
    * the funnel DP): for Gap, a prefix pointer folds a candidate into
    * the earliest/latest witnesses only once the scan has moved past its
    * timestamp, so a tie never witnesses its own batch; for Adjacent,
    * the predecessor is the whole tie-group at the maximal ts strictly
    * below — so array order inside a tie never decides a match. */
  private def matchFrom(ts: Array[Long], mask: Array[Int], p: Pattern, from: Int): Int = {
    val n = ts.length
    var cur: Array[Boolean] = null // cur(q) = anchor k can match at q
    var k = 0
    while (k < p.anchors.length) {
      val bit = 1 << (p.anchors(k) - 1)
      val next = new Array[Boolean](n)
      if (k == 0) {
        var q = from
        while (q < n) { next(q) = (mask(q) & bit) != 0; q += 1 }
      } else p.seps(k - 1) match {
        case Adjacent =>
          // "directly follows" is defined by TIMESTAMP, not array slot:
          // q's predecessor is the tie-group holding the maximal ts
          // strictly below ts(q), and the anchor chains iff ANY event of
          // that group matched the previous anchor. Array order inside an
          // equal-µs tie (possible after ns→µs truncation) therefore
          // never decides a match, and the SQL statement of the same
          // semantics is `b.t > a.t AND NOT EXISTS (x: a.t < x.t < b.t)`
          // over the relevant events — exactly what the oracles state.
          var anyCurPrev = false // any cur() in the predecessor tie-group
          var groupStart = from  // start of the tie-group containing q
          var q = from + 1
          while (q < n) {
            if (ts(q) != ts(q - 1)) {
              anyCurPrev = false
              var p = groupStart
              while (p < q && !anyCurPrev) { anyCurPrev = cur(p); p += 1 }
              groupStart = q
            }
            next(q) = (mask(q) & bit) != 0 && anyCurPrev
            q += 1
          }
        case Gap(op, secs) =>
          // prefix witnesses over cur with ts STRICTLY below ts(q):
          // latest p (tight window) and earliest p (wide window);
          // sorted ts make one of them optimal
          var earliest = -1L; var hasE = false
          var latest = -1L
          var fold = from // first index not yet folded into the witnesses
          var q = from
          while (q < n) {
            while (fold < q && ts(fold) < ts(q)) {
              if (cur(fold)) {
                if (!hasE) { earliest = ts(fold); hasE = true }
                latest = ts(fold)
              }
              fold += 1
            }
            if ((mask(q) & bit) != 0 && hasE) {
              next(q) = op match {
                case 0 => true
                case '<' | '≤' => tsOk(op, ts(q) - latest, secs)
                case '>' | '≥' => tsOk(op, ts(q) - earliest, secs)
                case '=' =>
                  // equality has no monotone witness; scan (rare op)
                  var pi = from; var ok = false
                  while (pi < q && !ok) {
                    ok = cur(pi) && ts(pi) < ts(q) &&
                      ts(q) - ts(pi) == secs * 1000000L
                    pi += 1
                  }
                  ok
              }
            }
            q += 1
          }
      }
      cur = next
      k += 1
    }
    var q = from
    while (q < ts.length) { if (cur(q)) return q + 1; q += 1 }
    -1
  }

  /** true iff the pattern matches anywhere in the group's sequence. */
  def matches(ts: Array[Long], mask: Array[Int], p: Pattern): Boolean =
    ts.nonEmpty && matchFrom(ts, mask, p, 0) >= 0

  /** number of non-overlapping matches, scanning left to right (each
    * match resumes after the previous match's last anchor event). */
  def countMatches(ts: Array[Long], mask: Array[Int], p: Pattern): Int = {
    var from = 0
    var n = 0
    while (from < ts.length) {
      val end = matchFrom(ts, mask, p, from)
      if (end < 0) return n
      n += 1
      from = end
    }
    n
  }

  /** CANONICAL sort of the buffered pairs: by (ts, mask), so the result
    * never depends on aggregation-buffer merge order. Equal-µs ties
    * (the ns→µs truncation can produce them) order by mask — and since
    * Gap transitions require strictly increasing ts and Adjacent treats
    * the predecessor tie-group as a set, tie order influences NOTHING:
    * the match result is a pure function of the (ts, mask) multiset. */
  private def sorted(state: FunnelAggs.FunnelState): (Array[Long], Array[Int]) = {
    val m = state.ts.length
    val idx = (0 until m).sortBy(i => (state.ts(i), state.mask(i))).toArray
    (idx.map(i => state.ts(i)), idx.map(i => state.mask(i)))
  }

  // ------------------------------------------------------------ aggregate

  /** graft_sequence_match(pattern, ts, cond1, …) → boolean;
    * graft_sequence_count(pattern, ts, cond1, …) → int. */
  case class SequenceAggExpr(
      pattern: String, tsExpr: Expression, conds: Seq[Expression],
      countMode: Boolean,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[FunnelAggs.FunnelState] {

    @transient private lazy val parsed = parse(pattern)
    require(conds.nonEmpty && conds.size <= 31, "need 1..31 conditions")

    override def children: Seq[Expression] = tsExpr +: conds
    override def dataType: DataType = if (countMode) IntegerType else BooleanType
    override def nullable: Boolean = false
    override def prettyName: String =
      if (countMode) "graft_sequence_count" else "graft_sequence_match"

    override def checkInputDataTypes(): TypeCheckResult = {
      if (tsExpr.dataType != TimestampType && tsExpr.dataType != LongType)
        TypeCheckResult.TypeCheckFailure(
          s"ts must be TIMESTAMP or BIGINT µs, got ${tsExpr.dataType}")
      else if (!conds.forall(_.dataType == BooleanType))
        TypeCheckResult.TypeCheckFailure("every condition must be BOOLEAN")
      else if (!parsed.anchors.forall(_ <= conds.size))
        TypeCheckResult.TypeCheckFailure(
          s"pattern references a condition beyond the ${conds.size} supplied")
      else TypeCheckResult.TypeCheckSuccess
    }

    override def createAggregationBuffer(): FunnelAggs.FunnelState =
      new FunnelAggs.FunnelState

    override def update(buffer: FunnelAggs.FunnelState, input: InternalRow): FunnelAggs.FunnelState = {
      val t = tsExpr.eval(input)
      if (t != null) {
        var m = 0
        var i = 0
        while (i < conds.size) {
          val c = conds(i).eval(input)
          if (c != null && c.asInstanceOf[Boolean]) m |= 1 << i
          i += 1
        }
        // rows matching no condition are skipped (reference semantics)
        if (m != 0) { buffer.ts += t.asInstanceOf[Long]; buffer.mask += m }
      }
      buffer
    }

    override def merge(buffer: FunnelAggs.FunnelState, other: FunnelAggs.FunnelState): FunnelAggs.FunnelState = {
      buffer.ts ++= other.ts; buffer.mask ++= other.mask; buffer
    }

    override def eval(buffer: FunnelAggs.FunnelState): Any = {
      val (ts, mask) = sorted(buffer)
      if (countMode) countMatches(ts, mask, parsed) else matches(ts, mask, parsed)
    }

    override def serialize(buffer: FunnelAggs.FunnelState): Array[Byte] =
      FunnelAggs.serState(buffer)
    override def deserialize(bytes: Array[Byte]): FunnelAggs.FunnelState =
      FunnelAggs.deserState(bytes)

    override def withNewMutableAggBufferOffset(newOffset: Int): SequenceAggExpr =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): SequenceAggExpr =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): SequenceAggExpr =
      copy(tsExpr = newChildren.head, conds = newChildren.tail)
  }

  // --------------------------------------------------------- registration

  def register(spark: SparkSession): Unit =
    RegisterOnce(spark, "SequenceMatch")(doRegister(spark))
  private def doRegister(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction("graft_sequence_match",
      { exprs =>
        require(exprs.length >= 3, "graft_sequence_match(pattern, ts, cond1, ...)")
        SequenceAggExpr(ExprLits.litStr(exprs.head, "pattern"), exprs(1), exprs.drop(2),
          countMode = false).toAggregateExpression()
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction("graft_sequence_count",
      { exprs =>
        require(exprs.length >= 3, "graft_sequence_count(pattern, ts, cond1, ...)")
        SequenceAggExpr(ExprLits.litStr(exprs.head, "pattern"), exprs(1), exprs.drop(2),
          countMode = true).toAggregateExpression()
      }, "built-in")
  }
}
