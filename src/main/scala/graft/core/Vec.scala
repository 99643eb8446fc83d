package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<double>` columns as pure higher-order-function
  * compositions — no UDFs, so expressions stay serializable, pushdown-safe,
  * and translatable 1:1 into the DuckDB oracle's list functions.
  *
  * Generalizes the reference's hard-coded 2-D Euclidean distance
  * (/root/reference/master.py:90-94, /root/reference/mapper.py:26-30) to N-D,
  * which is the proto-declared semantics (kmeans.proto:5-7).
  *
  * Accumulation is sequential left-to-right over the array (the `aggregate`
  * HOF), so results are bit-deterministic for a given element order.
  */
object Vec {

  /** Squared Euclidean distance: sum_i (a_i - b_i)^2. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)

  /** Euclidean distance (reference: sqrt((x2-x1)^2 + (y2-y1)^2), mapper.py:26-30). */
  def dist(a: Column, b: Column): Column = sqrt(sqDist(a, b))

  /** Dot product. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Elementwise sum (reference reducer's per-dimension accumulation loop,
    * /root/reference/reducer.py:23-25).
    */
  def add(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x + y)

  /** Scalar multiply. */
  def scale(a: Column, k: Column): Column = transform(a, x => x * k)

  /** Round every element to `d` decimals (oracle float-drift canonicalizer,
    * SURVEY.md §7.4 risk 1).
    */
  def roundTo(a: Column, d: Int): Column = transform(a, x => round(x, d))
}
