package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}

/** Generated-column partition pruning.
  *
  * A 100 TB fact table is laid out as `t/gpart_<src>_day=YYYY-MM-DD/`
  * — a DERIVED day directory over a fine-grained source timestamp
  * column that stays in the data files (so every query keeps its
  * exact schema and semantics; the partition column is pure layout,
  * dropped on read by [[graft.Tables.table]]). Queries, however,
  * filter the SOURCE column (`l_shipdate >= '1994-01-01'`), and
  * Catalyst cannot know that `gpart_l_shipdate_day` is a function of
  * `l_shipdate` — without help, every date-filtered scan still lists
  * and reads every day directory.
  *
  * This rule closes that gap the way lakehouse engines do for
  * generated columns (Delta's `GENERATED ALWAYS AS (CAST(ts AS
  * DATE))` partition-filter derivation, re-derived for vanilla
  * parquet): for each conjunct comparing a mapped source column with
  * a foldable expression, inject the IMPLIED predicate on the
  * generated day column. With `day = floor_day(src)` monotone
  * non-decreasing in `src`:
  *
  *  - `src >= L` and `src > L`  imply `day >= floor_day(L)`
  *  - `src <= L` and `src < L`  imply `day <= floor_day(L)`
  *  - `src = L`                 implies `day = floor_day(L)`
  *  - `src IN (L…)`             implies `day IN (floor_day(L)…)`
  *
  * The injected conjunct is REDUNDANT for row semantics (the exact
  * source predicate still runs) but FileSourceStrategy recognizes it
  * as a partition-column filter, so the scan's `PartitionFilters`
  * prune whole day directories at planning time — at 1000-executor
  * scale, the difference between listing 7 years and reading one.
  *
  * Naming convention: a DateType partition column `gpart_<src>_day`
  * maps to data column `<src>` (timestamp / timestamp_ntz / date).
  * Unpartitioned layouts and plain-partitioned tables are untouched;
  * the rule is a no-op unless both ends of a mapping resolve.
  */
object PartitionDatePruning extends Rule[LogicalPlan] with PredicateHelper {

  private val GPart = "^gpart_(.+)_day$".r

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, rel: LogicalRelation)
        if rel.relation.isInstanceOf[HadoopFsRelation] =>
      val fs = rel.relation.asInstanceOf[HadoopFsRelation]
      val mappings: Seq[(Attribute, Attribute)] =
        fs.partitionSchema.fields.toSeq.flatMap { pf =>
          GPart.findFirstMatchIn(pf.name).toSeq.flatMap { m =>
            if (pf.dataType != DateType) Nil
            else for {
              g <- rel.output.find(a => conf.resolver(a.name, pf.name)).toSeq
              s <- rel.output.find(a => conf.resolver(a.name, m.group(1))).toSeq
              if s.dataType == TimestampNTZType ||
                s.dataType == TimestampType || s.dataType == DateType
            } yield (s, g)
          }
        }
      if (mappings.isEmpty) f
      else {
        val conjuncts = splitConjunctivePredicates(cond)
        val implied = conjuncts
          .flatMap(c => mappings.flatMap { case (s, g) => imply(c, s, g) })
          // idempotency under the fixed-point batch: a conjunct this
          // rule added on a prior pass must not be re-added
          .filterNot(ip => conjuncts.exists(_.semanticEquals(ip)))
        if (implied.isEmpty) f
        else Filter(And(cond, implied.reduce(And)), rel)
      }
  }

  /** floor-to-day of a foldable bound, as a foldable Date expression
    * (session time zone only matters for LTZ inputs; NTZ/date floors
    * are zone-free, matching the naive layout convention). */
  private def day(e: Expression): Expression =
    Cast(e, DateType, Some(conf.sessionLocalTimeZone))

  /** The source attribute behind a comparison operand: bare, or
    * wrapped in the timestamp⇄timestamp_ntz cast the analyzer's type
    * coercion inserts (In widens NTZ columns to LTZ, casting the
    * ATTRIBUTE side). The cast form is matched only under a UTC
    * session: with no DST the NTZ⇄LTZ mapping is a fixed monotone
    * bijection, so day-flooring the (cast-typed) bound yields the
    * same day the uncast column would — in a DST zone a repeated
    * local hour could straddle midnight, so soundness wins over
    * coverage and the wrapped form is skipped. Richer wrappings
    * (`to_date(src) = …`) are deliberately not matched. */
  private object SrcAttr {
    def unapply(e: Expression): Option[Attribute] = e match {
      case a: Attribute => Some(a)
      case Cast(a: Attribute, TimestampType | TimestampNTZType, _, _)
          if conf.sessionLocalTimeZone == "UTC" => Some(a)
      case _ => None
    }
  }

  /** The implied day-column predicate for one conjunct, if it is a
    * plain comparison between the mapped source attribute and a
    * foldable bound (either operand order). */
  private def imply(c: Expression, s: Attribute,
                    g: Attribute): Option[Expression] = c match {
    case GreaterThanOrEqual(SrcAttr(a), l)
        if a.semanticEquals(s) && l.foldable => Some(GreaterThanOrEqual(g, day(l)))
    case GreaterThan(SrcAttr(a), l)
        if a.semanticEquals(s) && l.foldable => Some(GreaterThanOrEqual(g, day(l)))
    case LessThan(SrcAttr(a), l)
        if a.semanticEquals(s) && l.foldable => Some(LessThanOrEqual(g, day(l)))
    case LessThanOrEqual(SrcAttr(a), l)
        if a.semanticEquals(s) && l.foldable => Some(LessThanOrEqual(g, day(l)))
    case EqualTo(SrcAttr(a), l)
        if a.semanticEquals(s) && l.foldable => Some(EqualTo(g, day(l)))
    case GreaterThanOrEqual(l, SrcAttr(a))
        if a.semanticEquals(s) && l.foldable => Some(LessThanOrEqual(g, day(l)))
    case GreaterThan(l, SrcAttr(a))
        if a.semanticEquals(s) && l.foldable => Some(LessThanOrEqual(g, day(l)))
    case LessThan(l, SrcAttr(a))
        if a.semanticEquals(s) && l.foldable => Some(GreaterThanOrEqual(g, day(l)))
    case LessThanOrEqual(l, SrcAttr(a))
        if a.semanticEquals(s) && l.foldable => Some(GreaterThanOrEqual(g, day(l)))
    case EqualTo(l, SrcAttr(a))
        if a.semanticEquals(s) && l.foldable => Some(EqualTo(g, day(l)))
    case In(SrcAttr(a), vs)
        if a.semanticEquals(s) && vs.nonEmpty && vs.forall(_.foldable) =>
      Some(In(g, vs.map(day).distinct))
    case _ => None
  }
}
