package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Automatic predicate→zonemap routing for the versioned table
  * (`ParquetTableSink.table()`): a plain `.filter(col >= lo && col < hi)`
  * over a sink-backed read prunes buckets through the OPTIMIZER, the way
  * Postgres pushes WHERE into its scans for free — the caller writes
  * filters, not `scanRange` route calls.
  *
  * Mechanics: `table()` registers each immutable bucket data dir
  * (`data/b{X}-v{N}` — content never changes after promotion, so its
  * committed zonemap entry is version-exact forever) with that bucket's
  * per-column min/max strings. This rule matches `Filter` directly over a
  * parquet `LogicalRelation` whose root paths are ALL registered, tests
  * each range/equality conjunct against each path's zone entry — pure
  * driver-side JVM work, Catalyst TRY-casts under the session timezone
  * plus the column type's interpreted ordering, zero Spark jobs — and
  * rebuilds the relation over only the surviving paths (same output
  * attributes, so the residual filter needs no remapping and still
  * applies in full: a kept false-positive bucket is filtered row-wise,
  * exactly like `scanRange`).
  *
  * Conservative by construction: a missing zone entry, an uncastable
  * stored bound, a NULL literal, a type-mismatched comparison, or any
  * conjunct shape the rule doesn't recognize keeps the bucket — pruning
  * only ever happens on a proof of disjointness. Idempotent: a pruned
  * relation's paths are still registered, re-testing keeps them all, and
  * the rule returns the node unchanged — the fixed-point batch
  * terminates.
  *
  * The registry holds one entry per bucket dir per committed version a
  * `table()` call exposed — a few strings each, bounded by table count ×
  * buckets × retained versions, never by data.
  */
object ZonemapRouteRule extends Rule[LogicalPlan] with PredicateHelper {

  /** bucket data dir (absolute filesystem path) → column → (min, max)
    * strings as committed in the manifest sidecar. An empty map means
    * "registered but nothing provable" — the path is recognized as
    * sink-backed yet never skipped. */
  private val pathZones = new ConcurrentHashMap[String, Map[String, (String, String)]]()

  def register(path: String, zones: Map[String, (String, String)]): Unit =
    pathZones.put(path, zones)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // DPP-analog for the versioned sink: in `fact ⋈ dim ON fact.k = dim.k`
    // with a filtered dim side, the dim's SURVIVING buckets' zonemap
    // entries for k bound the join-key interval, and fact buckets provably
    // outside it are dropped — a dim-predicate-driven fact prune with zero
    // Spark jobs (Spark's own DPP needs a runtime subquery; the sink's
    // committed per-bucket bounds give a static, conservative analog).
    // Inner/LeftSemi only: every output row needs a join match, so a fact
    // row outside the dim key interval cannot contribute. Both orientations
    // are tried — "fact" is just whichever side the other side can narrow.
    case j @ Join(left, right, jt, Some(cond), _) if jt == Inner || jt == LeftSemi =>
      val keyPairs = splitConjunctivePredicates(cond).collect {
        case EqualTo(a: AttributeReference, b: AttributeReference) => (a, b)
      }
      if (keyPairs.isEmpty) j
      else {
        val newLeft = keyPairs.foldLeft(left) { case (side, (a, b)) =>
          val (lk, rk) = if (left.outputSet.contains(a)) (a, b) else (b, a)
          if (!left.outputSet.contains(lk) || !right.outputSet.contains(rk)) side
          else keyBounds(right, rk).map(bs => pruneByKey(side, lk, bs)).getOrElse(side)
        }
        val newRight = keyPairs.foldLeft(right) { case (side, (a, b)) =>
          val (lk, rk) = if (left.outputSet.contains(a)) (a, b) else (b, a)
          if (!left.outputSet.contains(lk) || !right.outputSet.contains(rk)) side
          else keyBounds(left, lk).map(bs => pruneByKey(side, rk, bs)).getOrElse(side)
        }
        if (newLeft.eq(left) && newRight.eq(right)) j
        else j.copy(left = newLeft, right = newRight)
      }
    case f @ Filter(cond, l: LogicalRelation) =>
      l.relation match {
        case fs: HadoopFsRelation if fs.location.rootPaths.nonEmpty =>
          val roots = fs.location.rootPaths
          val zoneOf = roots.map(p => p -> pathZones.get(p.toUri.getPath))
          if (zoneOf.exists(_._2 == null)) f // not (all) sink-backed: not ours
          else {
            val conjuncts = splitConjunctivePredicates(cond)
            val kept = zoneOf.collect {
              case (p, zones) if conjuncts.forall(keeps(zones, _)) => p
            }
            if (kept.size == roots.size) f
            else if (kept.isEmpty) LocalRelation(l.output)
            else {
              val idx = new InMemoryFileIndex(
                fs.sparkSession, kept, Map.empty, Some(fs.dataSchema))
              Filter(cond, l.copy(relation = fs.copy(location = idx)(fs.sparkSession)))
            }
          }
        case _ => f
      }
  }

  /** Does `conjunct` allow the bucket described by `zones` to hold a
    * matching row? True (keep) unless the zone entry PROVES disjointness. */
  private def keeps(zones: Map[String, (String, String)], conjunct: Expression): Boolean = {
    def zone(a: AttributeReference): Option[(Any, Any)] =
      zones.get(a.name).flatMap { case (loS, hiS) =>
        val lo = tryCastStr(loS, a.dataType)
        val hi = tryCastStr(hiS, a.dataType)
        // an all-NULL or uncastable zone entry proves nothing: keep
        if (lo == null || hi == null) None else Some((lo, hi))
      }
    // keep iff any of `vs` (internal-typed candidate match values, nulls
    // ignored) could fall in the column's zone — or nothing is provable
    def anyHit(a: AttributeReference, vs: Seq[Any]): Boolean = {
      val nonNull = vs.filter(_ != null)
      if (nonNull.isEmpty) true
      else zone(a) match {
        case None => true
        case Some((zlo, zhi)) =>
          val ord = TypeUtils.getInterpretedOrdering(a.dataType)
          nonNull.exists(v => !(ord.lt(zhi, v) || ord.gt(zlo, v)))
      }
    }
    // overlap test for the value interval [glo, ghi] the conjunct admits
    // (null bound = unbounded on that side); skip iff provably disjoint
    def overlap(a: AttributeReference, v: Any, dt: DataType,
                test: (Ordering[Any], Any, Any) => Boolean): Boolean =
      if (v == null || dt != a.dataType) true
      else zone(a) match {
        case None => true
        case Some((zlo, zhi)) =>
          val ord = TypeUtils.getInterpretedOrdering(a.dataType)
          test(ord, zlo, zhi)
      }
    conjunct match {
      // a >= v: skip iff max < v
      case GreaterThanOrEqual(a: AttributeReference, Literal(v, dt)) =>
        overlap(a, v, dt, (ord, _, zhi) => !ord.lt(zhi, v))
      case LessThanOrEqual(Literal(v, dt), a: AttributeReference) =>
        overlap(a, v, dt, (ord, _, zhi) => !ord.lt(zhi, v))
      // a > v: skip iff max <= v
      case GreaterThan(a: AttributeReference, Literal(v, dt)) =>
        overlap(a, v, dt, (ord, _, zhi) => !ord.lteq(zhi, v))
      case LessThan(Literal(v, dt), a: AttributeReference) =>
        overlap(a, v, dt, (ord, _, zhi) => !ord.lteq(zhi, v))
      // a < v: skip iff min >= v
      case LessThan(a: AttributeReference, Literal(v, dt)) =>
        overlap(a, v, dt, (ord, zlo, _) => !ord.gteq(zlo, v))
      case GreaterThan(Literal(v, dt), a: AttributeReference) =>
        overlap(a, v, dt, (ord, zlo, _) => !ord.gteq(zlo, v))
      // a <= v: skip iff min > v
      case LessThanOrEqual(a: AttributeReference, Literal(v, dt)) =>
        overlap(a, v, dt, (ord, zlo, _) => !ord.gt(zlo, v))
      case GreaterThanOrEqual(Literal(v, dt), a: AttributeReference) =>
        overlap(a, v, dt, (ord, zlo, _) => !ord.gt(zlo, v))
      // a = v: skip iff v outside [min, max]
      case EqualTo(a: AttributeReference, Literal(v, dt)) =>
        overlap(a, v, dt, (ord, zlo, zhi) => !(ord.lt(zhi, v) || ord.gt(zlo, v)))
      case EqualTo(Literal(v, dt), a: AttributeReference) =>
        overlap(a, v, dt, (ord, zlo, zhi) => !(ord.lt(zhi, v) || ord.gt(zlo, v)))
      // a <=> v: for a non-null literal identical to a = v; a <=> NULL
      // matches null rows, which zones don't track — keep
      case EqualNullSafe(a: AttributeReference, Literal(v, dt)) =>
        overlap(a, v, dt, (ord, zlo, zhi) => !(ord.lt(zhi, v) || ord.gt(zlo, v)))
      case EqualNullSafe(Literal(v, dt), a: AttributeReference) =>
        overlap(a, v, dt, (ord, zlo, zhi) => !(ord.lt(zhi, v) || ord.gt(zlo, v)))
      // a IN (v1..vn): skip iff EVERY non-null value misses [min, max].
      // NULL list entries can never produce a TRUE match (three-valued =)
      // so they contribute nothing to the keep proof. Small lists survive
      // to this batch as In; larger ones are already InSet (OptimizeIn).
      case In(a: AttributeReference, list)
          if list.forall { case Literal(_, dt) => dt == a.dataType; case _ => false } =>
        anyHit(a, list.collect { case Literal(v, _) => v })
      case InSet(a: AttributeReference, hset) =>
        anyHit(a, hset.toSeq)
      // a LIKE 'p%': matching strings sort in [p, p+ε) — skip iff the
      // whole zone is below p, or the zone min already sorts above every
      // p-prefixed string (its p-length prefix exceeds p)
      case StartsWith(a: AttributeReference, Literal(p: UTF8String, StringType))
          if a.dataType == StringType && p != null =>
        zone(a) match {
          case None => true
          case Some((zlo, zhi)) =>
            val lo = zlo.asInstanceOf[UTF8String]
            val hi = zhi.asInstanceOf[UTF8String]
            val loPfx = lo.substring(0, p.numChars())
            !(hi.compareTo(p) < 0 || loPfx.compareTo(p) > 0)
        }
      case _ => true // unrecognized shape: proves nothing
    }
  }

  /** The sink-backed scan under a Project/Filter chain, with every filter
    * conjunct collected on the way down — None unless EVERY root path of
    * the relation is registered (a foreign parquet scan is never ours). */
  private def scanOf(p: LogicalPlan)
      : Option[(LogicalRelation, HadoopFsRelation, Seq[Expression])] = p match {
    case Project(_, child) => scanOf(child)
    case Filter(c, child) =>
      scanOf(child).map { case (l, fs, cs) => (l, fs, cs ++ splitConjunctivePredicates(c)) }
    case l: LogicalRelation => l.relation match {
      case fs: HadoopFsRelation if fs.location.rootPaths.nonEmpty &&
          fs.location.rootPaths.forall(r => pathZones.get(r.toUri.getPath) != null) =>
        Some((l, fs, Nil))
      case _ => None
    }
    case _ => None
  }

  /** The join-key intervals `side` can contribute: one [lo, hi] per bucket
    * SURVIVING side's own filters — an interval LIST, not their convex
    * union, so two surviving dim buckets with disjoint key ranges don't
    * smear into one wide bound that keeps every fact bucket in the gap.
    * None — no pruning possible — if the side is not a fully-registered
    * sink scan, the key is computed rather than stored, any surviving
    * bucket lacks a provable key zone, or no bucket survives at all (the
    * empty side is the Filter case's job, via LocalRelation +
    * empty-relation propagation). */
  private def keyBounds(side: LogicalPlan, key: AttributeReference): Option[Seq[(Any, Any)]] =
    scanOf(side).flatMap { case (l, fs, conjuncts) =>
      if (!l.outputSet.contains(key)) None
      else {
        // only conjuncts whose attributes resolve to the RELATION's own
        // outputs may narrow the survivor set: a Filter above a Project
        // can reference an alias that shadows a stored column's NAME
        // (e.g. (grp+1).as("grp")) — testing that against the stored
        // zones would derive bounds from the wrong buckets and prune
        // fact buckets that hold matches. Ignoring such a conjunct only
        // widens the bound: conservative.
        val applicable =
          conjuncts.filter(_.references.subsetOf(l.outputSet))
        val surviving = fs.location.rootPaths
          .map(p => pathZones.get(p.toUri.getPath))
          .filter(zs => applicable.forall(keeps(zs, _)))
        val bounds = surviving.map(zs =>
          zs.get(key.name).flatMap { case (loS, hiS) =>
            val lo = tryCastStr(loS, key.dataType)
            val hi = tryCastStr(hiS, key.dataType)
            if (lo == null || hi == null) None else Some((lo, hi))
          })
        if (surviving.isEmpty || bounds.exists(_.isEmpty)) None
        else Some(bounds.flatten)
      }
    }

  /** Drop `side`'s buckets whose zone for `key` is provably disjoint from
    * EVERY interval in `bounds`; buckets with no/uncastable key zone are
    * kept. Returns `side` untouched (reference-equal) when nothing
    * prunes. */
  private def pruneByKey(side: LogicalPlan, key: AttributeReference,
                         bounds: Seq[(Any, Any)]): LogicalPlan =
    scanOf(side) match {
      case Some((l, fs, _)) if l.outputSet.contains(key) =>
        val ord = TypeUtils.getInterpretedOrdering(key.dataType)
        val kept = fs.location.rootPaths.filter { p =>
          pathZones.get(p.toUri.getPath).get(key.name) match {
            case None => true
            case Some((loS, hiS)) =>
              val zlo = tryCastStr(loS, key.dataType)
              val zhi = tryCastStr(hiS, key.dataType)
              if (zlo == null || zhi == null) true
              else bounds.exists { case (blo, bhi) =>
                !(ord.lt(zhi, blo) || ord.gt(zlo, bhi))
              }
          }
        }
        if (kept.size == fs.location.rootPaths.size) side
        else if (kept.isEmpty)
          side.transform { case ll: LogicalRelation if ll.eq(l) => LocalRelation(l.output) }
        else {
          val idx = new InMemoryFileIndex(
            fs.sparkSession, kept, Map.empty, Some(fs.dataSchema))
          side.transform { case ll: LogicalRelation if ll.eq(l) =>
            l.copy(relation = fs.copy(location = idx)(fs.sparkSession)) }
        }
      case _ => side
    }

  /** TRY-cast a stored zone string to the column type under the session
    * timezone (zones are written as `CAST(x AS STRING)` by the sink). */
  private def tryCastStr(s: String, dt: DataType): Any =
    if (s == null) null
    else Cast(Literal(UTF8String.fromString(s), StringType), dt,
      Option(conf.sessionLocalTimeZone), EvalMode.TRY).eval(null)
}
