package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** TLE (two-line element set) parse pack — the reference engine's core
  * domain logic (`/root/reference/script.py:11-59`), re-expressed as pure
  * Catalyst Column expressions.
  *
  * No UDFs anywhere: every function below is a `when`/`substring`/`cast`
  * chain, so the whole parse stays inside WholeStageCodegen, null
  * propagation is free, and Catalyst can prune unused sub-expressions
  * (e.g. a query that only needs `norad_id` never evaluates the float
  * fields). Requires a non-ANSI session (`GraftSession` pins it): CAST of
  * malformed input must yield null, mirroring the reference's per-record
  * `except: return None` contract (`script.py:19-20,57-59`).
  *
  * Slice convention: the reference slices Python-style 0-based
  * `line[a:b]`; Spark `substring` is 1-based with a length, so
  * `line[a:b]` == `substring(line, a + 1, b - a)`.
  */
object TleFunctions {

  /** Decode TLE implied-decimal scientific notation — `tle_bstar`.
    *
    * Reference: `parse_bstar`, `/root/reference/script.py:11-20`.
    * `" 29526-4"` → `0.29526 * 10^-4`. Quirks replicated exactly:
    *
    *   - mantissa keeps its own sign characters, so a signed mantissa
    *     (`"-11606-4"`, `"+12345-4"`) builds the unparseable literal
    *     `"0.-11606"` → null (`script.py:17`), even though negative B* is
    *     physically common — load-bearing reference behavior (§2.12.1);
    *   - no exponent suffix → plain float parse fallthrough
    *     (`script.py:18`): `"0.001"` → 0.001, garbage → null;
    *   - `" 00000+0"` → 0.0; empty/blank → null.
    *
    * Deviation (documented): `10 ** int(exp)` is evaluated as an exact
    * multiply/divide by `10^|exp|` (exactly representable for |exp| ≤ 22)
    * instead of a multiply by `pow(10, exp)`. For negative exponents the
    * result is correctly rounded where Python's may carry the `pow`
    * error — within 1 ulp of the reference, and bit-deterministic across
    * engines, which the correctness oracle requires.
    */
  def tleBstar(raw: Column): Column = {
    val s = trim(raw)
    val last2 = substring(s, -2, 2)
    val mantissa = concat(lit("0."), s.substr(lit(1), length(s) - 2)).cast("double")
    val e = last2.cast("int")
    val scaled = when(e < 0, mantissa / pow(lit(10.0), -e))
      .otherwise(mantissa * pow(lit(10.0), e))
    when(last2.contains("-") || last2.contains("+"), scaled)
      .otherwise(s.cast("double"))
  }

  /** Strict B* decode — the §2.12.1 "fixed" variant: handles signed
    * mantissas (`"-11606-4"` → -0.11606e-4) instead of nulling them,
    * which is what a physically-correct decoder does. The default
    * `tleBstar` replicates the reference's null quirk; pipelines opt
    * into this one explicitly.
    */
  def tleBstarStrict(raw: Column): Column = {
    val s = trim(raw)
    val last2 = substring(s, -2, 2)
    val body = s.substr(lit(1), length(s) - 2)
    val sign = when(substring(body, 1, 1) === "-", lit(-1.0)).otherwise(lit(1.0))
    val digits = when(substring(body, 1, 1).isin("-", "+"),
      body.substr(lit(2), length(body))).otherwise(body)
    val mantissa = concat(lit("0."), digits).cast("double") * sign
    val e = last2.cast("int")
    val scaled = when(e < 0, mantissa / pow(lit(10.0), -e))
      .otherwise(mantissa * pow(lit(10.0), e))
    when(last2.contains("-") || last2.contains("+"), scaled)
      .otherwise(s.cast("double"))
  }

  /** Century pivot for 2-digit TLE epoch years (`script.py:28`):
    * `yy < 57` → 2000s, else 1900s (57 = Sputnik-era convention).
    */
  def tleFullYear(yy: Column): Column =
    when(yy < 57, yy + 2000).otherwise(yy + 1900)

  /** Fractional day-of-year → timestamp (`script.py:29`):
    * `datetime(year, 1, 1) + timedelta(days = epoch_day - 1)`.
    *
    * Deviation (documented): the sub-second fraction is floored to
    * microseconds; Python's `timedelta` rounds half-even at the same
    * precision, so results can differ by 1 µs at exact half-microsecond
    * boundaries. Floor is used because it is deterministic across Spark
    * and the DuckDB oracle.
    */
  def tleEpoch(fullYear: Column, epochDay: Column): Column = {
    val jan1 = make_date(fullYear, lit(1), lit(1)).cast("timestamp")
    val micros = floor((epochDay - lit(1)) * lit(86400000000.0)).cast("long")
    timestamp_micros(unix_micros(jan1) + micros)
  }

  /** The 13-field TLE record constructor — `tle_parse`.
    *
    * Reference: `parse_tle_pair`, `/root/reference/script.py:22-59`.
    * Returns a struct of the 11 data-derived fields (`sat_name` and
    * `fetched_at_utc` are caller context, added by the pipeline —
    * `script.py:120,128`), or NULL when any *required* field fails to
    * parse (whole-record-null, `script.py:57-59`). `b_star_drag` is NOT
    * required: `parse_bstar` has its own null fallback (`script.py:32`),
    * so a bad B* keeps the record with a null field.
    *
    * Short or malformed lines degrade exactly like the reference: an
    * out-of-range slice yields an empty/partial string whose cast is
    * null, which nulls the record — vs Python's IndexError-free slices
    * feeding `float("")` → exception → None. Alpha-5 NORAD ids (letter
    * prefix, `script.py:24`) cast to null → record dropped (§2.12.4).
    */
  def tleParse(line1: Column, line2: Column): Column = {
    val l1 = trim(line1)
    val l2 = trim(line2)

    val noradId = substring(l1, 3, 5).cast("int")                   // l1[2:7]
    val intlDes = trim(substring(l1, 10, 8))                        // l1[9:17]
    val epochYear = substring(l1, 19, 2).cast("int")                // l1[18:20]
    val epochDay = substring(l1, 21, 12).cast("double")             // l1[20:32]
    val epochUtc = tleEpoch(tleFullYear(epochYear), epochDay)
    val bStar = tleBstar(substring(l1, 54, 8))                      // l1[53:61]

    val inclination = substring(l2, 9, 8).cast("double")            // l2[8:16]
    val raan = substring(l2, 18, 8).cast("double")                  // l2[17:25]
    val eccentricity =
      concat(lit("0."), substring(l2, 27, 7)).cast("double")        // l2[26:33]
    val argPerigee = substring(l2, 35, 8).cast("double")            // l2[34:42]
    val meanAnomaly = substring(l2, 44, 8).cast("double")           // l2[43:51]
    val meanMotion = substring(l2, 53, 11).cast("double")           // l2[52:63]
    val revNumber = substring(l2, 64, 5).cast("int")                // l2[63:68]

    val required = Seq(
      noradId, epochYear, epochDay, inclination, raan,
      eccentricity, argPerigee, meanAnomaly, meanMotion, revNumber)
    val valid = required.map(_.isNotNull).reduce(_ && _)

    when(valid, struct(
      noradId.as("norad_id"),
      intlDes.as("intl_designator"),
      epochUtc.as("epoch_utc"),
      inclination.as("inclination"),
      raan.as("raan"),
      eccentricity.as("eccentricity"),
      argPerigee.as("arg_perigee"),
      meanAnomaly.as("mean_anomaly"),
      meanMotion.as("mean_motion"),
      bStar.as("b_star_drag"),
      revNumber.as("rev_number")))
  }

  /** NOAA F10.7 row decode (`/root/reference/script.py:67-71`): a
    * `[timestamp_string, flux_string]` pair → (date_utc, f10_7_flux).
    * The date is the segment before the first space (`row[0].split(" ")[0]`,
    * `script.py:69`); flux is a plain float parse.
    */
  def noaaDecode(pair: Column): Column = struct(
    to_date(split(element_at(pair, 1), " ").getItem(0)).as("date_utc"),
    element_at(pair, 2).cast("double").as("f10_7_flux"))
}
