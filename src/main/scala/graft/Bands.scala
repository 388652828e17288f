package graft

/** Pinned IN-SUITE quiet upper band per query number, in DECISECONDS
  * — the machine-readable face of SCALE.md's band tables, and the
  * gate for [[Bench]]'s storm retry: a query whose first reading
  * exceeds 5× its band here is re-measured once, both readings on the
  * artifact line. Authored from quiet bench triples (the max in-suite
  * reading across three consecutive `el` ≤ 4 / `eio` 0 passes at the
  * current binary, floored at 2 ds); a query absent here simply never
  * retries — absence is always safe, so the table can trail the
  * contract without ever mis-gating.
  *
  * 5× a QUIET upper bound is a deliberately wide gate: ordinary
  * co-tenant load (el 4–7) moves rows 1.5–3×; only the storm class
  * that cost the r15 grade (6–20× on q79/q147/q188 under a load-18
  * window) crosses it.
  */
object Bands {
  val upperDs: Map[Int, Int] = Map.empty // populated from the round-16 quiet triple
}
