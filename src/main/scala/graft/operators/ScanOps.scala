package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's DynamoDB scan/query surface re-expressed as a Catalyst
  * plan compiler.
  *
  * Reference: `aws/dynamo_manager.py:129` (`scan_table`) accepts a
  * projection (`fields`) and a conjunctive list of `(field, op, value)`
  * filters with operators `^ * == != > >= < <= [] in`, where `== None`
  * means attribute-not-exists and `!= None` attribute-exists.
  *
  * Here each filter compiles to a `Column` predicate and the whole scan is
  * a declarative `filter(...).select(...)` — Catalyst pushes the
  * predicates and the projection into the parquet scan (PushedFilters /
  * ReadSchema), so at 100 TB only the needed columns and row groups are
  * read, where the reference pages through a full table scan.
  */
sealed trait ScanFilter { def field: String }
object ScanFilter {
  final case class BeginsWith(field: String, value: String)       extends ScanFilter
  final case class Contains(field: String, value: String)         extends ScanFilter
  /** value None => attribute does not exist (IS NULL) */
  final case class Eq(field: String, value: Option[Any])          extends ScanFilter
  /** value None => attribute exists (IS NOT NULL) */
  final case class Ne(field: String, value: Option[Any])          extends ScanFilter
  final case class Gt(field: String, value: Any)                  extends ScanFilter
  final case class Ge(field: String, value: Any)                  extends ScanFilter
  final case class Lt(field: String, value: Any)                  extends ScanFilter
  final case class Le(field: String, value: Any)                  extends ScanFilter
  final case class Between(field: String, lo: Any, hi: Any)       extends ScanFilter
  final case class In(field: String, values: Seq[Any])            extends ScanFilter

  /** Parse the reference's string operator form, e.g. ("source_id", "^", "oqmd"). */
  def apply(field: String, op: String, value: Any): ScanFilter = op match {
    case "^"  => BeginsWith(field, value.asInstanceOf[String])
    case "*"  => Contains(field, value.asInstanceOf[String])
    case "==" => Eq(field, Option(value))
    case "!=" => Ne(field, Option(value))
    case ">"  => Gt(field, value)
    case ">=" => Ge(field, value)
    case "<"  => Lt(field, value)
    case "<=" => Le(field, value)
    case "in" => In(field, value.asInstanceOf[Seq[Any]])
    case "[]" => value.asInstanceOf[Seq[Any]] match {
      case Seq(lo, hi) => Between(field, lo, hi)
      case other       => throw new IllegalArgumentException(s"between needs [lo, hi], got $other")
    }
    case other => throw new IllegalArgumentException(s"Invalid filter operator '$other'")
  }
}

object ScanOps {
  import ScanFilter._

  def compile(f: ScanFilter): Column = f match {
    case BeginsWith(c, v) => col(c).startsWith(v)
    case Contains(c, v)   => col(c).contains(v)
    case Eq(c, None)      => col(c).isNull
    case Eq(c, Some(v))   => col(c) === lit(v)
    case Ne(c, None)      => col(c).isNotNull
    case Ne(c, Some(v))   => col(c) =!= lit(v)
    case Gt(c, v)         => col(c) > lit(v)
    case Ge(c, v)         => col(c) >= lit(v)
    case Lt(c, v)         => col(c) < lit(v)
    case Le(c, v)         => col(c) <= lit(v)
    case Between(c, lo, hi) => col(c) >= lit(lo) && col(c) <= lit(hi)
    case In(c, vs)        => col(c).isin(vs: _*)
  }

  /** `scan_table(fields, filters)`: conjunctive filters + projection. */
  def scan(df: DataFrame, fields: Seq[String] = Nil, filters: Seq[ScanFilter] = Nil): DataFrame = {
    val filtered = filters.map(compile).reduceOption(_ && _).map(df.filter).getOrElse(df)
    if (fields.isEmpty) filtered else filtered.select(fields.map(col): _*)
  }
}
