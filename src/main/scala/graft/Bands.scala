package graft

/** Pinned IN-SUITE quiet upper band per query number, in DECISECONDS
  * — the machine-readable face of SCALE.md's band tables, and the
  * gate for [[Bench]]'s storm retry: a query whose first reading
  * exceeds 5× its band here is re-measured once, both readings on the
  * artifact line. Authored from bench triples by `tools/bands.py`:
  * the MEDIAN in-suite reading across three consecutive passes at the
  * current binary, floored at 2 ds (median, not max — robust to one
  * contended pass and honest about the typical cost); a query absent
  * here simply never retries — absence is always safe, so the table
  * can trail the contract without ever mis-gating.
  *
  * 5× a QUIET upper bound is a deliberately wide gate: ordinary
  * co-tenant load (el 4–7) moves rows 1.5–3×; only the storm class
  * that cost the r15 grade (6–20× on q79/q147/q188 under a load-18
  * window) crosses it.
  */
object Bands {
  // authored by tools/bands.py from the round-17 triple at the FINAL
  // 265-query binary (suite totals 149.9 / 164.0 / 172.0 s, l0 1.3-3.8,
  // el 1-6, eio all-zero): per-query MEDIAN deciseconds across the
  // three passes, floored at 2 ds. Tighter than the r16 table almost
  // everywhere (the binary got faster: materialized frames + the
  // pruning fix); the round's quiet anchor (149.9 s) trips zero
  // retries and zero p2 re-reads against it.
  val upperDs: Map[Int, Int] = Map(
    1 -> 6, 2 -> 2, 3 -> 4, 4 -> 5, 5 -> 3, 6 -> 4, 7 -> 5, 8 -> 3,
    9 -> 2, 10 -> 2, 11 -> 3, 12 -> 3, 13 -> 2, 14 -> 4, 15 -> 6, 16 -> 10,
    17 -> 10, 18 -> 3, 19 -> 16, 20 -> 5, 21 -> 4, 22 -> 4, 23 -> 3, 24 -> 9,
    25 -> 7, 26 -> 2, 27 -> 2, 28 -> 6, 29 -> 2, 30 -> 4, 31 -> 6, 32 -> 2,
    33 -> 2, 34 -> 4, 35 -> 2, 36 -> 4, 37 -> 7, 38 -> 2, 39 -> 6, 40 -> 5,
    41 -> 38, 42 -> 6, 43 -> 6, 44 -> 5, 45 -> 6, 46 -> 4, 47 -> 2, 48 -> 3,
    49 -> 2, 50 -> 15, 51 -> 2, 52 -> 32, 53 -> 13, 54 -> 3, 55 -> 8, 56 -> 5,
    57 -> 2, 58 -> 4, 59 -> 4, 60 -> 7, 61 -> 6, 62 -> 2, 63 -> 4, 64 -> 11,
    65 -> 17, 66 -> 2, 67 -> 2, 68 -> 2, 69 -> 3, 70 -> 2, 71 -> 2, 72 -> 20,
    73 -> 2, 74 -> 11, 75 -> 2, 76 -> 3, 77 -> 11, 78 -> 14, 79 -> 3, 80 -> 10,
    81 -> 15, 82 -> 3, 83 -> 2, 84 -> 4, 85 -> 3, 86 -> 5, 87 -> 7, 88 -> 5,
    89 -> 2, 90 -> 4, 91 -> 2, 92 -> 3, 93 -> 5, 94 -> 5, 95 -> 9, 96 -> 2,
    97 -> 3, 98 -> 2, 99 -> 2, 100 -> 2, 101 -> 2, 102 -> 9, 103 -> 3, 104 -> 4,
    105 -> 3, 106 -> 5, 107 -> 5, 108 -> 21, 109 -> 2, 110 -> 16, 111 -> 3, 112 -> 4,
    113 -> 2, 114 -> 8, 115 -> 5, 116 -> 6, 117 -> 4, 118 -> 3, 119 -> 11, 120 -> 5,
    121 -> 22, 122 -> 3, 123 -> 5, 124 -> 4, 125 -> 6, 126 -> 6, 127 -> 4, 128 -> 3,
    129 -> 3, 130 -> 11, 131 -> 5, 132 -> 3, 133 -> 3, 134 -> 4, 135 -> 2, 136 -> 4,
    137 -> 3, 138 -> 2, 139 -> 5, 140 -> 2, 141 -> 12, 142 -> 2, 143 -> 3, 144 -> 14,
    145 -> 2, 146 -> 3, 147 -> 6, 148 -> 3, 149 -> 5, 150 -> 6, 151 -> 6, 152 -> 2,
    153 -> 5, 154 -> 3, 155 -> 5, 156 -> 4, 157 -> 3, 158 -> 2, 159 -> 3, 160 -> 3,
    161 -> 3, 162 -> 6, 163 -> 2, 164 -> 6, 165 -> 5, 166 -> 7, 167 -> 9, 168 -> 3,
    169 -> 14, 170 -> 3, 171 -> 4, 172 -> 4, 173 -> 3, 174 -> 6, 175 -> 7, 176 -> 2,
    177 -> 7, 178 -> 8, 179 -> 20, 180 -> 15, 181 -> 10, 182 -> 3, 183 -> 17, 184 -> 2,
    185 -> 3, 186 -> 2, 187 -> 4, 188 -> 5, 189 -> 5, 190 -> 9, 191 -> 11, 192 -> 3,
    193 -> 11, 194 -> 4, 195 -> 3, 196 -> 10, 197 -> 7, 198 -> 2, 199 -> 33, 200 -> 6,
    201 -> 7, 202 -> 2, 203 -> 10, 204 -> 3, 205 -> 6, 206 -> 10, 207 -> 12, 208 -> 3,
    209 -> 4, 210 -> 2, 211 -> 21, 212 -> 6, 213 -> 3, 214 -> 5, 215 -> 16, 216 -> 7,
    217 -> 6, 218 -> 15, 219 -> 8, 220 -> 3, 221 -> 10, 222 -> 7, 223 -> 6, 224 -> 3,
    225 -> 2, 226 -> 5, 227 -> 7, 228 -> 12, 229 -> 5, 230 -> 6, 231 -> 3, 232 -> 5,
    233 -> 3, 234 -> 17, 235 -> 17, 236 -> 6, 237 -> 4, 238 -> 5, 239 -> 7, 240 -> 6,
    241 -> 2, 242 -> 4, 243 -> 6, 244 -> 14, 245 -> 5, 246 -> 8, 247 -> 2, 248 -> 3,
    249 -> 6, 250 -> 6, 251 -> 6, 252 -> 8, 253 -> 3, 254 -> 6, 255 -> 8, 256 -> 8,
    257 -> 6, 258 -> 19, 259 -> 5, 260 -> 13, 261 -> 3, 262 -> 4, 263 -> 3, 264 -> 3,
    265 -> 2,
    // landing-commit isolated probes (QueryProbe ×4, reps 2-4 after
    // the one-time old-fixture builds the bench warm-up absorbs as
    // pqo/sho): q266 0.66/0.51/0.58 → 6 ds; q267 0.61/0.49/0.40 → 5 ds
    266 -> 6, 267 -> 5,
    // q268 isolated probe reps 2-4 after the one-time compaction
    // commit (1.21/1.00/0.84 at load 1.4): five full-tier count scans
    // off the compacted address → 10 ds
    268 -> 10,
    // q269 isolated probe reps 2-4 after the four one-time family
    // compactions (3.07/2.45/1.89 at load 2.0-2.4): one 7-scan union
    // plan over the compacted simhash/semcc/pq/ivf tiers → 22 ds
    269 -> 22,
    // q270 isolated probe reps 2-4 after the one-time old-fixture
    // build + landing (0.52/0.49/0.48 at load 2.9): one filtered scan
    // of the landed tf tier → 5 ds
    270 -> 5)
}
