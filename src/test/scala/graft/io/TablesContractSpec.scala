package graft.io

import graft.SparkSpec
import org.apache.spark.sql.types._

/** Type-family contract over EVERY testdata table — the generalization
  * of EventsContractSpec after the round-4 lesson (the environment
  * regenerated events.parquet with a different physical encoding and
  * 8 queries failed at scattered call sites instead of one named
  * boundary). This spec asserts the properties the query surface
  * actually depends on — key columns integral, money/measure columns
  * floating, date columns in the timestamp family, names strings —
  * NOT exact physical types, so benign drift (int32 → int64 widening,
  * tz ↔ ntz timestamps) stays green while breaking drift (a key
  * arriving as string, a date arriving as int) fails with the table
  * and column named in one line.
  *
  * The timestamp-family membership matters doubly: query literals
  * compare against `cast("timestamp_ntz")` (orders/lineitem dates are
  * NTZ today) — if those columns ever arrive tz-typed, the implicit
  * coercion changes semantics under a non-UTC session. The harnesses
  * pin UTC, and this spec names the drift the day it happens.
  */
class TablesContractSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  private def integral(t: DataType): Boolean = t match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType => true
    case _ => false
  }
  private def floating(t: DataType): Boolean = t match {
    case _: FloatType | _: DoubleType => true
    case _ => false
  }
  private def temporal(t: DataType): Boolean = t match {
    case _: TimestampType | _: TimestampNTZType | _: DateType => true
    case _ => false
  }

  private val contract: Map[String, Seq[(String, DataType => Boolean, String)]] = Map(
    "region" -> Seq(("r_regionkey", integral, "integral"),
      ("r_name", _.isInstanceOf[StringType], "string")),
    "nation" -> Seq(("n_nationkey", integral, "integral"),
      ("n_regionkey", integral, "integral")),
    "customer" -> Seq(("c_custkey", integral, "integral"),
      ("c_nationkey", integral, "integral"),
      ("c_acctbal", floating, "floating"),
      ("c_mktsegment", _.isInstanceOf[StringType], "string")),
    "supplier" -> Seq(("s_suppkey", integral, "integral"),
      ("s_nationkey", integral, "integral"),
      ("s_acctbal", floating, "floating")),
    "part" -> Seq(("p_partkey", integral, "integral"),
      ("p_size", integral, "integral"),
      ("p_retailprice", floating, "floating")),
    "orders" -> Seq(("o_orderkey", integral, "integral"),
      ("o_custkey", integral, "integral"),
      ("o_totalprice", floating, "floating"),
      ("o_orderdate", temporal, "timestamp-family")),
    "lineitem" -> Seq(("l_orderkey", integral, "integral"),
      ("l_partkey", integral, "integral"),
      ("l_suppkey", integral, "integral"),
      ("l_quantity", floating, "floating"),
      ("l_extendedprice", floating, "floating"),
      ("l_discount", floating, "floating"),
      ("l_shipdate", temporal, "timestamp-family")),
    "documents" -> Seq(("doc_id", integral, "integral"),
      ("text", _.isInstanceOf[StringType], "string"),
      ("lang", _.isInstanceOf[StringType], "string"),
      ("source", _.isInstanceOf[StringType], "string"),
      ("n_chars", integral, "integral")),
    "embeddings" -> Seq(("vec_id", integral, "integral"),
      ("label", integral, "integral"),
      ("embedding", {
        case ArrayType(e, _) => floating(e)
        case _ => false
      }: DataType => Boolean, "array<floating>"))
  )

  test("every table satisfies the type-family contract the queries depend on") {
    val drifts = contract.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val schema = Tables(spark, dir, table).schema
      cols.flatMap { case (name, ok, family) =>
        schema.fields.find(_.name == name) match {
          case None => Some(s"$table.$name: MISSING from ${schema.fieldNames.mkString(",")}")
          case Some(f) if !ok(f.dataType) =>
            Some(s"$table.$name: ${f.dataType.simpleString} not in $family family")
          case _ => None
        }
      }
    }
    assert(drifts.isEmpty,
      s"testdata schema drifted — fix the named loader/query boundary:\n${drifts.mkString("\n")}")
  }

  test("events contract is covered by EventsContractSpec (ts normalization)") {
    // events is the one table with an active normalization layer —
    // asserted in depth there; here only that it loads with the other
    // non-ts columns intact.
    val schema = Tables.events(spark, dir).schema
    Seq("event_id", "user_id", "event_type", "value", "props").foreach { c =>
      assert(schema.fieldNames.contains(c), s"events.$c missing")
    }
  }
}
