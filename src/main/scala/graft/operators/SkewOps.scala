package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * At 100 TB a handful of hot keys (one dataset with 10^9 records, one
  * user with most events) make one reducer the job's critical path. AQE's
  * skew-join handles sort-merge cases at runtime; this utility is the
  * explicit variant for when the skew is known: replicate the small side
  * `salt` times and scatter the big side's hot keys uniformly, so the
  * hot key's rows land on `salt` reducers instead of one.
  */
object SkewOps {

  /** Inner-join `big` with `small` on `key`, salting `big` uniformly.
    * `small` is replicated `salt` times (explode), so correctness is
    * unchanged for any key distribution. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", pmod(xxhash64(monotonically_increasing_id()), lit(salt)))
    val saltedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
