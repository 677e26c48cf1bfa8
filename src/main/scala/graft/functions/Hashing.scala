package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash families for the sketch operators (MinHash, SimHash, LSH
  * banding).
  *
  * Production default is xxhash64 — codegen'd, 64-bit, fast. The
  * polynomial family exists because xxhash64 is not reproducible in
  * other engines: an external SQL oracle (DuckDB) can replay
  * `h = (h*31 + codepoint) mod 1e9+7` exactly via `list_reduce` over
  * the characters, so sketch queries registered with the polynomial
  * family get full row/schema/hash oracle verification instead of
  * rows-only checks. Same sketch math, pluggable hash.
  *
  * Scale note: [[poly]] runs through the codegen'd
  * [[graft.plans.PolyHash]] expression (a tight code-point loop);
  * xxhash64 remains ~2x faster and 64-bit wide, so it stays the
  * 100 TB default. Only [[polyLongs]] (a 32-element fold per band)
  * still uses a lambda `aggregate`. [[poly]] registers graft's
  * functions on the ACTIVE session; in multi-session apps where the
  * frame's owner session is not the active one, call
  * [[graft.plans.GraftFunctions.register]] on the owning session
  * first (same caveat as `TextFunctions.textStats`).
  */
object Hashing {

  /** Modulus of the polynomial family (fits 31 bits). */
  val Mod: Long = 1000000007L

  /** Seeded 64-bit hash of a string column (production family). */
  def xx(seed: Int, s: Column): Column = xxhash64(lit(seed), s)

  /** Seeded polynomial rolling hash over the code points:
    * h = (h*31 + codepoint) mod 1e9+7, starting from `seed`. The
    * same recurrence as [[TextFunctions.fingerprint]] (seed 0),
    * evaluated by the codegen'd [[graft.plans.PolyHash]] expression
    * (a per-character lambda chain here made the sketch queries
    * interpreter-bound). Registers on the active session.
    */
  def poly(seed: Int, s: Column): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.plans.GraftFunctions.register)
    call_function("graft_poly_hash", s, lit(seed.toLong))
  }

  /** Polynomial hash of a long-array column (used to bucket LSH
    * signature bands). Values are folded mod 1e9+7 first so the fold
    * also accepts arbitrary 64-bit inputs.
    */
  def polyLongs(arr: Column): Column =
    aggregate(arr, lit(0L),
      (acc, v) => pmod(acc * lit(31L) + pmod(v, lit(Mod)), lit(Mod)))

  /** ~60-bit polynomial hash: two seeded <2^30 halves packed as
    * hi*2^30 + lo — wide enough for simhash bit sampling (bits 0..59
    * populated, 60..63 always zero), still oracle-replayable.
    */
  def poly60(s: Column): Column =
    poly(7, s) * lit(1073741824L) + poly(13, s)
}
