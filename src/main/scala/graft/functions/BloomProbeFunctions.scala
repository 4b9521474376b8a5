package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.functions._

/** The plan-literal bloom probe, shared by the batch bloom semi-join
  * (q26, `ops.Relational`) and the streaming novelty screen (S8,
  * `streaming.Streams`): a serialized `util.sketch.BloomFilter` planted
  * as a literal under Spark's own `BloomFilterMightContain` — the
  * expression `InjectRuntimeFilter` plants, minus its cost gates. The
  * literal ships with the task binaries exactly like a broadcast would,
  * and the probe stays a native Catalyst expression: codegen'd at the
  * top level (q26's fact-scan filter), and interpreted-but-closure-free
  * inside a higher-order function ([[countMaybeHits]]) — either way no
  * ScalaUDF enters the plan, which a measured q26 experiment showed
  * breaks whole-stage codegen on the enclosing scan and costs more than
  * the work it saves.
  */
object BloomProbe {

  /** `might_contain(bloomBytes, value)` — `value` must be LongType (the
    * builtin probes longs); the bloom must have been built over the SAME
    * long domain (`stat.bloomFilter` on a long column puts raw longs). */
  def mightContain(bloomBytes: Array[Byte], value: Column): Column =
    GraftBridge.column(BloomFilterMightContain(
      GraftBridge.expression(lit(bloomBytes)),
      GraftBridge.expression(value)))

  /** Count of `arr`'s (string) elements whose xxhash64 probes positive
    * against a bloom built over `xxhash64` of the same element domain.
    * A HOF-over-array fold of the native probe — the no-UDF form of
    * "how many of this row's grams has the index seen": no closure
    * broadcast, no per-row Scala collection conversion, the bloom
    * deserialized once per task from the plan literal. The xxhash64
    * pre-hash folds the string domain onto the longs the builtin probes;
    * its collision odds between distinct grams (~n²/2⁶⁴) are far below
    * any practical bloom fpp, and a collision only ever ADDS a maybe-hit
    * — the probe's one-sidedness (no false negatives) is preserved. */
  def countMaybeHits(bloomBytes: Array[Byte], arr: Column): Column =
    aggregate(arr, lit(0L),
      (acc, g) => acc +
        when(mightContain(bloomBytes, xxhash64(g)), lit(1L)).otherwise(lit(0L)))
}
