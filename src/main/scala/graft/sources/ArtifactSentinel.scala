package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Artifact-vs-live sentinel — the correctness-gate cross-check behind
  * served [[IndexCatalog]] artifacts (round-12 verdict item 2).
  *
  * The catalog's manifest guards (key, builder version, input
  * fingerprint, owner-scoped code fingerprint) make a stale adopt a
  * should-never-happen — but rounds 11/12 carried one hash-red gate row
  * (`q_quality_tertiles`) that was green on every local re-verify, and
  * the only surviving hypothesis was an adopt of an artifact whose
  * bytes no longer matched its live recompute IN THAT environment.
  * Guards that only inspect metadata cannot refute that hypothesis;
  * this sentinel checks the BYTES: for each registered artifact it
  * digests the served relation and the live builder plan, and on any
  * difference invalidates the artifact ([[IndexCatalog.invalidate]]),
  * rebuilds, and re-digests — turning a silent straddle into a logged,
  * auto-healed event in `sentinel_report.json`.
  *
  * Sentinel coverage is prioritized by consumer shape (verdict item 7):
  * every artifact backing a query that aggregates over the ENTIRE
  * relation is listed (a full-aggregate consumer is poisoned by any
  * stale row; a top-k consumer can stay green on a stale tail). The
  * registry lives in [[graft.operators.SentinelChecks]].
  *
  * Cost: one live recompute per artifact at GATE scale (sf0.01) — the
  * price of an attributable gate. At 100 TB the same digest runs over a
  * deterministic id-range slice instead of the full corpus; the digest
  * is order-insensitive, so the slice choice only changes coverage,
  * never validity.
  */
object ArtifactSentinel {

  /** One sentinel: a served relation and the live plan that must equal
    * it byte-for-byte (both unordered — the digest sorts nothing and
    * sums per-row hashes instead). `key` maps the corpus dir to the
    * catalog key to invalidate on mismatch. */
  final case class Check(
      name: String,
      key: String => String,
      artifact: (SparkSession, String) => DataFrame,
      live: (SparkSession, String) => DataFrame)

  /** Order-insensitive frame digest: (row count, Σ xxhash64(canonical
    * row json)) with the sum in decimal(38,0) so it can never overflow
    * (ANSI mode throws on long overflow; 10^13 rows × 2^63 ≈ 10^32 fits
    * decimal(38) with headroom). Columns enter the struct name-sorted,
    * so the digest is independent of projection order. */
  def digest(df: DataFrame): (Long, String) = {
    val cols = df.columns.sorted.map(col)
    val r = df
      .select(xxhash64(to_json(struct(cols: _*))).as("h"))
      .agg(count(lit(1)).as("n"),
        sum(col("h").cast("decimal(38,0)")).as("s"))
      .head() // 1-row telemetry frame (the IvfLifecycle pattern)
    (r.getLong(0), Option(r.getDecimal(1)).map(_.toBigInteger.toString)
      .getOrElse("empty"))
  }

  /** Run every check against corpus `d`: returns name → status with
    * status ∈ `ok` | `healed:...` (mismatch found, artifact rebuilt,
    * digests now equal) | `MISMATCH:...` (a byte divergence the heal
    * path could not clear — rebuild ran and still diverges, OR the
    * divergence was PROVEN and the heal itself threw; [[graft.Verify]]
    * fails the gate on any such status AFTER all query dumps are
    * written) | `error:...` (the check threw BEFORE any divergence was
    * established — missing table at some SF, transient engine error).
    * Each check is individually guarded so one throwing check can
    * never abort the sweep, let alone the query dump loop that follows
    * it (the prebuild loop's per-artifact catch discipline); fatal JVM
    * errors (OOM, interrupts) propagate — a heap-corrupted sweep must
    * not keep dumping results the gate will trust. */
  def run(s: SparkSession, d: String, checks: Seq[Check]): Seq[(String, String)] =
    checks.map { c =>
      def err(e: Throwable) =
        s"${e.getClass.getSimpleName}:" +
          Option(e.getMessage).getOrElse("").take(200)
      val status =
        try {
          val got = digest(c.artifact(s, d))
          val want = digest(c.live(s, d))
          if (got == want) "ok"
          else
            // divergence PROVEN from here on: a throw during the heal
            // must stay a gate-failing MISMATCH, never soften to error:
            try {
              IndexCatalog.invalidate(s, c.key(d))
              val healed = digest(c.artifact(s, d)) // re-ensure → rebuild
              if (healed == want)
                s"healed:stale-artifact served=${fmt(got)} live=${fmt(want)}"
              else
                s"MISMATCH:rebuild-diverges served=${fmt(got)} " +
                  s"rebuilt=${fmt(healed)} live=${fmt(want)}"
            } catch {
              case scala.util.control.NonFatal(e) =>
                s"MISMATCH:heal-failed served=${fmt(got)} " +
                  s"live=${fmt(want)} heal=${err(e)}"
            }
        } catch {
          case scala.util.control.NonFatal(e) => s"error:${err(e)}"
        }
      c.name -> status
    }

  private def fmt(d: (Long, String)): String = s"(${d._1},${d._2})"

  /** Cross-run consecutive-error ledger (r14 advice item 2). A check
    * that throws records `error:` and the gate exits 0 — acceptable
    * once (a transient), but a check that can NEVER run silently
    * disables its sentinel while the gate stays green. This ledger
    * persists the set of erroring check names per sf-dir under
    * `target/` (same lifetime as the artifact catalog: a clean build
    * resets both) and returns the checks that errored in BOTH the
    * previous full run and this one — Verify fails the gate on those
    * exactly as it does on a MISMATCH. */
  def persistentErrors(sfDir: String,
                       statuses: Seq[(String, String)]): Seq[(String, String)] = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val p = Paths.get(sys.props("user.dir"), "target",
      s"sentinel-errors-${IndexCatalog.tag(sfDir)}.txt")
    val prev: Set[String] =
      if (Files.exists(p)) Files.readAllLines(p).asScala.toSet else Set.empty
    val cur = statuses.filter(_._2.startsWith("error:"))
    Files.createDirectories(p.getParent)
    Files.write(p, cur.map(_._1).mkString("\n").getBytes("UTF-8"))
    cur.filter { case (k, _) => prev(k) }
  }
}
