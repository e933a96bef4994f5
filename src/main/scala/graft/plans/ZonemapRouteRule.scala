package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftAnti, LeftOuter, LeftSemi, RightOuter}
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
    // Per-side prunability follows the join type's preservation rules: a
    // side may be pruned by the other's key bounds only when its rows
    // contribute to the output EXCLUSIVELY through a join match. Inner and
    // LeftSemi allow both sides; an outer join's PRESERVED side must never
    // be pruned (unmatched rows still flow out) but its non-preserved side
    // may be (an unmatched inner row only pads NULLs that a missing row
    // pads identically); LeftAnti's right side only matters where it CAN
    // match, so it too prunes — while its left side is all-preserved-or-
    // dropped and must stay whole. FullOuter preserves both: untouched.
    //
    // Composite keys prune as one interval VECTOR per surviving bucket of
    // the bounding side, not per-column independently: a fact bucket
    // survives only if SOME single dim bucket overlaps it on EVERY key —
    // two dim buckets each matching a different key can no longer keep a
    // fact bucket neither could serve alone.
    case j @ Join(left, right, jt, Some(cond), _)
        if jt == Inner || jt == LeftSemi || jt == LeftOuter ||
          jt == RightOuter || jt == LeftAnti =>
      val (canPruneLeft, canPruneRight) = jt match {
        case Inner | LeftSemi => (true, true)
        case LeftOuter | LeftAnti => (false, true)
        case RightOuter => (true, false)
        case _ => (false, false)
      }
      val keyPairs = splitConjunctivePredicates(cond).collect {
        case EqualTo(x: AttributeReference, y: AttributeReference) => (x, y)
      }.flatMap { case (x, y) =>
        if (left.outputSet.contains(x) && right.outputSet.contains(y)) Some((x, y))
        else if (left.outputSet.contains(y) && right.outputSet.contains(x)) Some((y, x))
        else None
      }
      if (keyPairs.isEmpty) j
      else {
        val newLeft =
          if (!canPruneLeft) left
          else multiKeyBounds(right, keyPairs.map(_._2))
            .map(bs => pruneByKeys(left, keyPairs.map(_._1), bs)).getOrElse(left)
        val newRight =
          if (!canPruneRight) right
          else multiKeyBounds(left, keyPairs.map(_._1))
            .map(bs => pruneByKeys(right, keyPairs.map(_._2), bs)).getOrElse(right)
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
    * the relation is registered (a foreign parquet scan is never ours).
    *
    * The fourth element maps each PURE-RENAME output attribute of `p` (by
    * exprId) back to the relation's own attribute, composed through every
    * intervening Project — so `select(col("k").as("fk"))` between scan and
    * join no longer hides the stored column from the zonemap (the join key
    * `fk` resolves to `k`'s zones). Filter conjuncts are rewritten through
    * the map AT THEIR OWN LEVEL (where their references are in scope), so a
    * predicate stated above a renaming Project still narrows the survivor
    * set. Only exprId-keyed renames ride the map: an alias over a COMPUTED
    * expression gets no entry, its conjuncts/keys stay unresolvable, and
    * every consumer already treats that as "proves nothing" — conservative,
    * and immune to name shadowing (e.g. (grp+1).as("grp")) by construction. */
  private def scanOf(p: LogicalPlan)
      : Option[(LogicalRelation, HadoopFsRelation, Seq[Expression],
                Map[ExprId, AttributeReference])] = p match {
    case Project(plist, child) =>
      scanOf(child).map { case (l, fs, cs, m) =>
        val m2 = plist.flatMap {
          case a: AttributeReference => m.get(a.exprId).map(a.exprId -> _)
          case al @ Alias(ar: AttributeReference, _) =>
            m.get(ar.exprId).map(al.exprId -> _)
          case _ => None
        }.toMap
        (l, fs, cs, m2)
      }
    case Filter(c, child) =>
      scanOf(child).map { case (l, fs, cs, m) =>
        val remapped = splitConjunctivePredicates(c).map(_.transform {
          case a: AttributeReference => m.getOrElse(a.exprId, a)
        })
        (l, fs, cs ++ remapped, m)
      }
    case l: LogicalRelation => l.relation match {
      case fs: HadoopFsRelation if fs.location.rootPaths.nonEmpty &&
          fs.location.rootPaths.forall(r => pathZones.get(r.toUri.getPath) != null) =>
        Some((l, fs, Nil, l.output.map(a => a.exprId -> a).toMap))
      case _ => None
    }
    case _ => None
  }

  /** The per-key zone of one bucket's `zones` entry for `key`, as an
    * internal-typed interval — None when the key has no provable zone in
    * this bucket (missing entry, uncastable bound, or the attribute isn't
    * a stored column of relation `l`), which every consumer treats as
    * "unbounded: proves nothing". */
  private def keyZone(l: LogicalRelation, zones: Map[String, (String, String)],
                      key: AttributeReference): Option[(Any, Any)] =
    if (!l.outputSet.contains(key)) None
    else zones.get(key.name).flatMap { case (loS, hiS) =>
      val lo = tryCastStr(loS, key.dataType)
      val hi = tryCastStr(hiS, key.dataType)
      if (lo == null || hi == null) None else Some((lo, hi))
    }

  /** The join-key interval VECTORS `side` can contribute: one entry per
    * bucket surviving the side's own filters, holding that bucket's zone
    * per key (None = unbounded on that key). A LIST of per-bucket vectors,
    * not a per-key convex union, so (a) two surviving dim buckets with
    * disjoint key ranges don't smear into one wide bound that keeps every
    * fact bucket in the gap, and (b) a composite key prunes on the
    * CONJUNCTION of its columns' overlaps within one bucket. None — no
    * pruning possible — if the side is not a fully-registered sink scan,
    * no bucket survives at all (the empty side is the Filter case's job,
    * via LocalRelation + empty-relation propagation), or some surviving
    * bucket is unbounded in EVERY key (it admits anything, so no bucket
    * on the other side could ever be dropped). */
  private def multiKeyBounds(side: LogicalPlan, keys: Seq[AttributeReference])
      : Option[Seq[Seq[Option[(Any, Any)]]]] =
    scanOf(side).flatMap { case (l, fs, conjuncts, renames) =>
      // only conjuncts whose attributes resolve (possibly through scanOf's
      // rename map) to the RELATION's own outputs may narrow the survivor
      // set — an alias over a computed expression never resolves, and
      // ignoring its conjunct only widens the bound: conservative.
      val applicable = conjuncts.filter(_.references.subsetOf(l.outputSet))
      val surviving = fs.location.rootPaths
        .map(p => pathZones.get(p.toUri.getPath))
        .filter(zs => applicable.forall(keeps(zs, _)))
      val resolved = keys.map(k => renames.get(k.exprId))
      val vectors = surviving.map(zs => resolved.map(_.flatMap(keyZone(l, zs, _))))
      if (surviving.isEmpty || vectors.exists(_.forall(_.isEmpty))) None
      else Some(vectors)
    }

  /** Drop `side`'s buckets whose key zones are provably disjoint — on at
    * least one key — from EVERY interval vector in `bounds`; a key with
    * no provable zone on either end overlaps trivially. Returns `side`
    * untouched (reference-equal) when nothing prunes. */
  private def pruneByKeys(side: LogicalPlan, keys: Seq[AttributeReference],
                          bounds: Seq[Seq[Option[(Any, Any)]]]): LogicalPlan =
    scanOf(side) match {
      case Some((l, fs, _, renames)) =>
        val ords = keys.map(k => TypeUtils.getInterpretedOrdering(k.dataType))
        val resolved = keys.map(k => renames.get(k.exprId))
        val kept = fs.location.rootPaths.filter { p =>
          val zs = pathZones.get(p.toUri.getPath)
          val mine = resolved.map(_.flatMap(keyZone(l, zs, _)))
          bounds.exists(vec => keys.indices.forall { i =>
            (mine(i), vec(i)) match {
              case (Some((zlo, zhi)), Some((blo, bhi))) =>
                !(ords(i).lt(zhi, blo) || ords(i).gt(zlo, bhi))
              case _ => true // either side unbounded on this key
            }
          })
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
