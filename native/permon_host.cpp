// permon_host — native host-side setup kernels for permon_tpu.
//
// The reference implements its setup machinery (gluing assembly via PetscSF
// star forests, qpfeti.c:405-925; matrix format conversions,
// extension.c:233-324) in C. These are the TPU-native counterparts: they run
// on host at setup time and emit the static index/value arrays the device
// operators consume. Exposed with a plain C ABI and loaded via ctypes
// (permon_tpu/utils/native.py); a numpy fallback exists for every entry
// point.
//
// Conventions: l2g is (ns, nl) int64 row-major with -1 marking padding dofs;
// decomposed dof ids are s*nl + i; copies of a global dof are ordered by
// subdomain index (the reference's rank order, which fixes gluing signs).

#include <algorithm>
#include <array>
#include <map>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Count multiplicity of each global dof. mult must hold n_global zeros.
void permon_multiplicity(const int64_t* l2g, int64_t ns, int64_t nl,
                         int64_t n_global, int64_t* mult) {
  for (int64_t s = 0; s < ns; ++s)
    for (int64_t i = 0; i < nl; ++i) {
      int64_t g = l2g[s * nl + i];
      if (g >= 0) mult[g]++;
    }
}

// Upper bound on gluing entries for buffer allocation.
int64_t permon_gluing_bound(const int64_t* l2g, int64_t ns, int64_t nl,
                            int64_t n_global, int32_t type) {
  std::vector<int64_t> mult(n_global, 0);
  permon_multiplicity(l2g, ns, nl, n_global, mult.data());
  int64_t total = 0;
  for (int64_t g = 0; g < n_global; ++g) {
    int64_t d = mult[g];
    if (d < 2) continue;
    if (type == 1)  // full: all pairs, 2 entries each
      total += d * (d - 1);
    else if (type == 2)  // orth: row k has k+1 entries, k = 1..d-1
      total += (d - 1) * (d + 2) / 2;
    else  // nonred: d-1 pair rows
      total += 2 * (d - 1);
  }
  return total;
}

// Build the gluing matrix Bg as COO over the decomposed space.
// type: 0 = nonred, 1 = full, 2 = orth; scale: 1/sqrt(multiplicity) for
// nonred/full (the reference's -SCALE_ON default, qpfeti.c:757-760).
// exclude: optional sorted array of global dofs to skip (may be null).
// Outputs rows/cols/vals sized by permon_gluing_bound; returns the number of
// entries written; *n_rows_out receives the number of gluing rows.
int64_t permon_build_gluing(const int64_t* l2g, int64_t ns, int64_t nl,
                            int64_t n_global, int32_t type, int32_t scale,
                            const int64_t* exclude, int64_t n_exclude,
                            int64_t* rows, int64_t* cols, double* vals,
                            int64_t* n_rows_out) {
  // bucket the copies of each global dof, ordered by subdomain index
  std::vector<int64_t> mult(n_global, 0);
  permon_multiplicity(l2g, ns, nl, n_global, mult.data());
  std::vector<int64_t> offs(n_global + 1, 0);
  for (int64_t g = 0; g < n_global; ++g) offs[g + 1] = offs[g] + mult[g];
  std::vector<int64_t> copies(offs[n_global]);
  std::vector<int64_t> fill(n_global, 0);
  for (int64_t s = 0; s < ns; ++s)
    for (int64_t i = 0; i < nl; ++i) {
      int64_t g = l2g[s * nl + i];
      if (g >= 0) copies[offs[g] + fill[g]++] = s * nl + i;
    }

  int64_t t = 0, r = 0;
  for (int64_t g = 0; g < n_global; ++g) {
    int64_t d = mult[g];
    if (d < 2) continue;
    if (exclude && std::binary_search(exclude, exclude + n_exclude, g)) continue;
    const int64_t* idx = &copies[offs[g]];
    double ms = (scale && type != 2) ? 1.0 / std::sqrt((double)d) : 1.0;
    if (type == 0) {  // nonred: (0, j) pairs
      for (int64_t j = 1; j < d; ++j) {
        rows[t] = r; cols[t] = idx[0]; vals[t] = ms; ++t;
        rows[t] = r; cols[t] = idx[j]; vals[t] = -ms; ++t;
        ++r;
      }
    } else if (type == 1) {  // full: all pairs
      for (int64_t a = 0; a < d; ++a)
        for (int64_t b = a + 1; b < d; ++b) {
          rows[t] = r; cols[t] = idx[a]; vals[t] = ms; ++t;
          rows[t] = r; cols[t] = idx[b]; vals[t] = -ms; ++t;
          ++r;
        }
    } else {  // orth: row k = (1/k,...,1/k,-1)/sqrt(1/k + 1) on copies 0..k
      for (int64_t k = 1; k < d; ++k) {
        double nrm = 1.0 / std::sqrt(1.0 / (double)k + 1.0);
        for (int64_t a = 0; a < k; ++a) {
          rows[t] = r; cols[t] = idx[a]; vals[t] = nrm / (double)k; ++t;
        }
        rows[t] = r; cols[t] = idx[k]; vals[t] = -nrm; ++t;
        ++r;
      }
    }
  }
  *n_rows_out = r;
  return t;
}

// Pack a COO matrix over the decomposed space into the batched per-subdomain
// extension triplets (ns, k). Returns k (max entries per subdomain); call
// with rows_out == null first to query k, then with buffers of size ns*k.
// Padded slots get row m (the dummy dual entry) and val 0.
int64_t permon_pack_extension(const int64_t* rows, const int64_t* cols,
                              const double* vals, int64_t nnz, int64_t m,
                              int64_t ns, int64_t nl, int32_t* rows_out,
                              int32_t* cols_out, double* vals_out) {
  std::vector<int64_t> counts(ns, 0);
  for (int64_t t = 0; t < nnz; ++t) counts[cols[t] / nl]++;
  int64_t k = 1;
  for (int64_t s = 0; s < ns; ++s) k = std::max(k, counts[s]);
  if (!rows_out) return k;
  for (int64_t s = 0; s < ns; ++s)
    for (int64_t j = 0; j < k; ++j) {
      rows_out[s * k + j] = (int32_t)m;
      cols_out[s * k + j] = 0;
      vals_out[s * k + j] = 0.0;
    }
  std::vector<int64_t> fill(ns, 0);
  for (int64_t t = 0; t < nnz; ++t) {
    int64_t s = cols[t] / nl;
    int64_t j = fill[s]++;
    rows_out[s * k + j] = (int32_t)rows[t];
    cols_out[s * k + j] = (int32_t)(cols[t] % nl);
    vals_out[s * k + j] = vals[t];
  }
  return k;
}

// Convert CSR to padded ELL. Call with cols_out == null to query k.
int64_t permon_csr_to_ell(const int64_t* indptr, const int64_t* indices,
                          const double* data, int64_t m, int32_t* cols_out,
                          double* vals_out) {
  int64_t k = 1;
  for (int64_t i = 0; i < m; ++i) k = std::max(k, indptr[i + 1] - indptr[i]);
  if (!cols_out) return k;
  for (int64_t i = 0; i < m; ++i) {
    int64_t lo = indptr[i], hi = indptr[i + 1];
    for (int64_t j = 0; j < k; ++j) {
      cols_out[i * k + j] = (j < hi - lo) ? (int32_t)indices[lo + j] : 0;
      vals_out[i * k + j] = (j < hi - lo) ? data[lo + j] : 0.0;
    }
  }
  return k;
}

}  // extern "C"

#include <bitset>
#include <unordered_map>

namespace {

// Greedy SELL round scheduler state (permon_tpu/core/sell.py): one round =
// one (8,128) output tile pass against one `win`-element window of x
// (win a multiple of 1024; the source sublane index s then spans
// [0, win/128)).  Constraints per round: one nonzero per output slot
// (i,j); a single consistent sublane-select S[i,c] per (sublane, lane).
struct SellRound {
  int32_t tile, win;
  int16_t S[1024];             // (i, c) -> sublane in window, -1 = unset
  std::bitset<1024> used;      // (i, j) slot occupancy
};

// Run the greedy assignment; fills per-nnz round ids and the round list.
void sell_greedy(const int64_t* indptr, const int64_t* indices, int64_t m,
                 int64_t ntiles, int64_t win, std::vector<int32_t>& assign,
                 std::vector<SellRound>& rounds) {
  assign.assign(indptr[m], -1);
  rounds.clear();
  std::vector<std::pair<int64_t, int64_t>> order;  // (col - row, p) per tile
  for (int64_t t = 0; t < ntiles; ++t) {
    size_t tile_first = rounds.size();
    std::unordered_map<int64_t, std::vector<int32_t>> per_w;
    int64_t g_lo = t * 1024, g_hi = std::min(m, (t + 1) * 1024);
    // visit nonzeros DIAGONAL-major: all nnz of one offset within a row
    // group have distinct lanes and a single consistent sublane, so they
    // pack into one round with no S conflicts — row-major order interleaves
    // offsets and manufactures conflicts (measured: eff 0.60 -> near the
    // structural bound on the RCM Laplacian)
    order.clear();
    for (int64_t g = g_lo; g < g_hi; ++g)
      for (int64_t p = indptr[g]; p < indptr[g + 1]; ++p)
        order.emplace_back(indices[p] - g, p);
    std::sort(order.begin(), order.end());
    // windows are 1024-aligned but NOT win-aligned: a greedy interval
    // cover of this tile's column blocks places each window where a band
    // cluster actually sits, so a cluster never straddles a window edge
    // (lifts the structural efficiency bound from 0.70 to 0.84 at
    // win = 2048 on the RCM 3-D Laplacian)
    std::vector<int64_t> wstarts;  // window start block ids (1024-elements)
    {
      std::vector<int64_t> blocks;
      for (int64_t p = indptr[g_lo]; p < indptr[g_hi]; ++p)
        blocks.push_back(indices[p] >> 10);
      std::sort(blocks.begin(), blocks.end());
      blocks.erase(std::unique(blocks.begin(), blocks.end()), blocks.end());
      int64_t nb = win >> 10, cov_end = -1;
      for (int64_t b : blocks)
        if (b > cov_end) { wstarts.push_back(b); cov_end = b + nb - 1; }
    }
    for (auto& op_ : order) {
      int64_t p = op_.second;
      // recover the row of nonzero p by binary search over indptr
      int64_t lo = g_lo, hi = g_hi;
      while (lo + 1 < hi) {
        int64_t mid = (lo + hi) / 2;
        if (indptr[mid] <= p) lo = mid; else hi = mid;
      }
      int64_t g = lo;
      {
        int64_t rloc = g - g_lo;
        int i = (int)(rloc / 128), j = (int)(rloc % 128);
        int64_t col = indices[p];
        // window = the cover interval containing col's block
        int64_t w = *(std::upper_bound(wstarts.begin(), wstarts.end(),
                                       col >> 10) - 1);
        int s = (int)((col - (w << 10)) / 128), c = (int)(col % 128);
        int32_t rid = -1;
        // best-fit: an exact S[i,c] == s match first (free), else a round
        // with the (i,c) pair unset (burns a fresh slot other nonzeros may
        // have needed) — first-fit alone loses ~3% slot efficiency
        int32_t fresh = -1;
        for (int32_t cand : per_w[w]) {
          SellRound& R = rounds[cand];
          if (R.used[i * 128 + j]) continue;
          int16_t cur = R.S[i * 128 + c];
          if (cur == (int16_t)s) { rid = cand; break; }
          if (cur == -1 && fresh < 0) fresh = cand;
        }
        if (rid < 0) rid = fresh;
        if (rid < 0) {
          rid = (int32_t)rounds.size();
          rounds.emplace_back();
          SellRound& R = rounds.back();
          R.tile = (int32_t)t;
          R.win = (int32_t)w;
          std::memset(R.S, -1, sizeof(R.S));
          per_w[w].push_back(rid);
        }
        SellRound& R = rounds[rid];
        R.S[i * 128 + c] = (int16_t)s;
        R.used[i * 128 + j] = true;
        assign[p] = rid;
      }
    }
    if (rounds.size() == tile_first) {  // tile with no nonzeros: zero round
      rounds.emplace_back();
      SellRound& R = rounds.back();
      R.tile = (int32_t)t;
      R.win = 0;
      std::memset(R.S, -1, sizeof(R.S));
    }
  }
}

// Drain compaction over the greedy schedule: within each (tile, window)
// group, sweep the thin rounds and migrate every entry that fits into a
// fuller round (slot free, S[i,c] unset-or-equal); rounds drained to zero
// die.  Single moves alone fixpoint ~1 excess round per (tile, window) on
// wiggly-band matrices (round-4 measurement on the RCM 3-D Laplacian:
// eff 0.622 greedy -> 0.721 drained vs the 0.840 slot/consistency-aware
// lower bound of scripts/sell_bound.py); the round-5 RELOCATION CHAINS
// close most of the rest: when entry p of a draining round cannot enter
// any target because one blocker (an occupied output slot or a
// single-user S conflict) stands in the way, the blocker is first moved
// to a third round, then p takes its place — a depth-2 augmenting step.
// Entries are identified by nnz index p so the final C/V fill-in below
// stays driven by `assign`.
void sell_compact(const int64_t* indptr, const int64_t* indices, int64_t m,
                  std::vector<int32_t>& assign,
                  std::vector<SellRound>& rounds) {
  int64_t nnz = indptr[m];
  int64_t nr = (int64_t)rounds.size();
  // per-round entry lists + S refcounts (per (i,c): count of users of the
  // single s currently set there)
  std::vector<std::vector<int64_t>> ents(nr);
  std::vector<std::array<int16_t, 1024>> ref(nr);
  for (auto& a : ref) a.fill(0);
  std::vector<int64_t> row_of(nnz);
  for (int64_t g = 0; g < m; ++g)
    for (int64_t p = indptr[g]; p < indptr[g + 1]; ++p) row_of[p] = g;
  for (int64_t p = 0; p < nnz; ++p) {
    int32_t r = assign[p];
    if (r < 0) continue;
    ents[r].push_back(p);
    int64_t rloc = row_of[p] % 1024;
    int ic = (int)(rloc / 128) * 128 + (int)(indices[p] % 128);
    ref[r][ic]++;
  }
  // group rounds by (tile, window)
  std::map<std::pair<int32_t, int32_t>, std::vector<int32_t>> groups;
  for (int64_t r = 0; r < nr; ++r)
    groups[{rounds[r].tile, rounds[r].win}].push_back((int32_t)r);
  std::vector<int32_t> live_per_tile;
  {
    int32_t max_tile = 0;
    for (auto& R : rounds) max_tile = std::max(max_tile, R.tile);
    live_per_tile.assign(max_tile + 1, 0);
    for (auto& R : rounds) live_per_tile[R.tile]++;
  }
  std::vector<char> dead(nr, 0);

  // geometry of entry p within its tile/window group
  auto geom = [&](int64_t p, int64_t w, int& i, int& j, int& c, int& s) {
    int64_t rloc = row_of[p] % 1024;
    i = (int)(rloc / 128);
    j = (int)(rloc % 128);
    c = (int)(indices[p] % 128);
    s = (int)((indices[p] - (w << 10)) / 128);
  };
  // legality of p (currently in round `from`) entering round `tgt`
  auto fits = [&](int64_t p, int32_t tgt) -> bool {
    int i, j, c, s;
    geom(p, rounds[tgt].win, i, j, c, s);
    SellRound& T = rounds[tgt];
    if (T.used[i * 128 + j]) return false;
    int16_t cur = T.S[i * 128 + c];
    return cur == -1 || cur == (int16_t)s;
  };
  // unconditional apply of a legal move p: src -> tgt (keeps ents/ref/S
  // consistent; caller guarantees fits())
  auto apply_move = [&](int64_t p, int32_t src, int32_t tgt) {
    int i, j, c, s;
    geom(p, rounds[tgt].win, i, j, c, s);
    SellRound& T = rounds[tgt];
    T.S[i * 128 + c] = (int16_t)s;
    T.used[i * 128 + j] = true;
    ref[tgt][i * 128 + c]++;
    ents[tgt].push_back(p);
    assign[p] = tgt;
    SellRound& Ssrc = rounds[src];
    Ssrc.used[i * 128 + j] = false;
    if (--ref[src][i * 128 + c] == 0) Ssrc.S[i * 128 + c] = -1;
    auto& se = ents[src];
    for (size_t e = 0; e < se.size(); ++e)
      if (se[e] == p) {
        se[e] = se.back();
        se.pop_back();
        break;
      }
  };
  // the ONE blocker stopping p from entering tgt, or -1 when there are
  // several (slot occupant first; else the single user of a conflicting
  // S[i,c]); -2 when p already fits
  auto blocker_of = [&](int64_t p, int32_t tgt) -> int64_t {
    int i, j, c, s;
    geom(p, rounds[tgt].win, i, j, c, s);
    SellRound& T = rounds[tgt];
    bool slot_busy = T.used[i * 128 + j];
    int16_t cur = T.S[i * 128 + c];
    bool s_conflict = (cur != -1 && cur != (int16_t)s);
    if (!slot_busy && !s_conflict) return -2;
    if (slot_busy && s_conflict) {
      // solvable only when ONE entry is both the slot occupant and the
      // sole user of the conflicting S[i,c]
      if (ref[tgt][i * 128 + c] != 1) return -1;
      for (int64_t q : ents[tgt]) {
        int qi, qj, qc, qs;
        geom(q, rounds[tgt].win, qi, qj, qc, qs);
        if (qi == i && qj == j) return qc == c ? q : -1;
      }
      return -1;
    }
    if (slot_busy) {
      for (int64_t q : ents[tgt]) {
        int qi, qj, qc, qs;
        geom(q, rounds[tgt].win, qi, qj, qc, qs);
        if (qi == i && qj == j) return q;
      }
      return -1;
    }
    // single-user S conflict: movable only when exactly one entry holds it
    if (ref[tgt][i * 128 + c] != 1) return -1;
    for (int64_t q : ents[tgt]) {
      int qi, qj, qc, qs;
      geom(q, rounds[tgt].win, qi, qj, qc, qs);
      if (qi == i && qc == c) return q;
    }
    return -1;
  };

  for (int sweep = 0; sweep < 16; ++sweep) {
    int64_t killed = 0;
    bool chains = sweep >= 2;  // single-move sweeps reach fixpoint first
    for (auto& kv : groups) {
      auto& rl = kv.second;
      // ascending fill: drain thin rounds into fuller ones
      std::sort(rl.begin(), rl.end(), [&](int32_t a, int32_t b) {
        return ents[a].size() < ents[b].size();
      });
      for (size_t a = 0; a < rl.size(); ++a) {
        int32_t src = rl[a];
        if (dead[src]) continue;
        std::vector<int32_t> tgts;
        for (int32_t r : rl)
          if (r != src && !dead[r]) tgts.push_back(r);
        std::sort(tgts.begin(), tgts.end(), [&](int32_t x, int32_t y) {
          return ents[x].size() > ents[y].size();
        });
        if (tgts.empty()) continue;
        auto& src_ents = ents[src];
        for (size_t e = 0; e < src_ents.size();) {
          int64_t p = src_ents[e];
          bool moved = false;
          for (int32_t tgt : tgts)
            if (fits(p, tgt)) {
              apply_move(p, src, tgt);
              moved = true;
              break;
            }
          if (!moved && chains) {
            // depth-2 relocation: evict the single blocker of some target
            // into a third round, then take its place
            for (int32_t tgt : tgts) {
              int64_t q = blocker_of(p, tgt);
              if (q < 0) continue;
              for (int32_t r2 : tgts) {
                if (r2 == tgt) continue;
                if (!fits(q, r2)) continue;
                apply_move(q, tgt, r2);
                if (fits(p, tgt)) {
                  apply_move(p, src, tgt);
                  moved = true;
                }
                break;
              }
              if (moved) break;
            }
          }
          if (!moved) ++e;
        }
        if (src_ents.empty() && live_per_tile[rounds[src].tile] > 1) {
          dead[src] = 1;
          live_per_tile[rounds[src].tile]--;
          killed++;
        }
      }
    }
    if (killed == 0 && sweep >= 2) break;
  }
  // rebuild the round list (tile-sorted order is preserved: groups are
  // visited in (tile, win) order and survivors keep their relative order)
  std::vector<SellRound> out;
  std::vector<int32_t> remap(nr, -1);
  for (int64_t r = 0; r < nr; ++r)
    if (!dead[r]) {
      remap[r] = (int32_t)out.size();
      out.push_back(rounds[r]);
    }
  for (int64_t p = 0; p < nnz; ++p)
    if (assign[p] >= 0) assign[p] = remap[assign[p]];
  rounds.swap(out);
}

}  // namespace

extern "C" {

// SELL round schedule (permon_tpu/core/sell.py). `win` = window element
// count (multiple of 1024). Call with null outputs to query the round
// count nr, then with buffers wstart (nr), tid (nr), S/C (nr,8,128) int32,
// V (nr,8,128) double.
int64_t permon_sell_schedule(const int64_t* indptr, const int64_t* indices,
                             const double* data, int64_t m, int64_t ntiles,
                             int64_t win, int32_t* wstart, int32_t* tid,
                             int32_t* S, int32_t* C, double* V) {
  std::vector<int32_t> assign;
  std::vector<SellRound> rounds;
  sell_greedy(indptr, indices, m, ntiles, win, assign, rounds);
  sell_compact(indptr, indices, m, assign, rounds);
  int64_t nr = (int64_t)rounds.size();
  if (!wstart) return nr;
  for (int64_t r = 0; r < nr; ++r) {
    wstart[r] = (int32_t)(rounds[r].win * 8);  // start block -> x2d row
    tid[r] = rounds[r].tile;
    for (int64_t q = 0; q < 1024; ++q) {
      int16_t s = rounds[r].S[q];
      S[r * 1024 + q] = s < 0 ? 0 : (int32_t)s;
      C[r * 1024 + q] = 0;
      V[r * 1024 + q] = 0.0;
    }
  }
  for (int64_t g = 0; g < m; ++g) {
    int64_t slot = g % 1024;  // (i*128 + j) with i = rloc/128, j = rloc%128
    for (int64_t p = indptr[g]; p < indptr[g + 1]; ++p) {
      int64_t r = assign[p];
      C[r * 1024 + slot] = (int32_t)(indices[p] % 128);
      V[r * 1024 + slot] = data[p];
    }
  }
  return nr;
}

// Build the leaf-space partner map (permon_tpu/feti/leaf.py): for each
// (subdomain, slot) leaf of the batched extension triplets, the flat indices
// of the other leaves sharing its dual row, padded with nleaf (a zero slot).
// Call with partners == null to query deg_max; then with a buffer of size
// (deg_max - 1) * nleaf.  weights receives 1/deg at real leaves, 0 at pads.
int64_t permon_leaf_partners(const int32_t* rows, const double* vals,
                             int64_t ns, int64_t k, int64_t m,
                             int32_t* partners, double* weights) {
  int64_t nleaf = ns * k;
  std::vector<int64_t> mult(m, 0), offs(m + 1, 0), fill(m, 0);
  for (int64_t i = 0; i < nleaf; ++i)
    if (rows[i] != (int32_t)m && vals[i] != 0.0) mult[rows[i]]++;
  int64_t deg_max = 1;
  for (int64_t r = 0; r < m; ++r) deg_max = std::max(deg_max, mult[r]);
  if (!partners) return deg_max;
  for (int64_t r = 0; r < m; ++r) offs[r + 1] = offs[r] + mult[r];
  std::vector<int64_t> leaves(offs[m]);
  for (int64_t i = 0; i < nleaf; ++i)
    if (rows[i] != (int32_t)m && vals[i] != 0.0)
      leaves[offs[rows[i]] + fill[rows[i]]++] = i;
  for (int64_t d = 0; d < deg_max - 1; ++d)
    for (int64_t i = 0; i < nleaf; ++i) partners[d * nleaf + i] = (int32_t)nleaf;
  for (int64_t i = 0; i < nleaf; ++i) weights[i] = 0.0;
  for (int64_t r = 0; r < m; ++r) {
    int64_t d = mult[r];
    const int64_t* idx = &leaves[offs[r]];
    for (int64_t a = 0; a < d; ++a) {
      weights[idx[a]] = 1.0 / (double)d;
      int64_t w = 0;
      for (int64_t b = 0; b < d; ++b)
        if (b != a) partners[(w++) * nleaf + idx[a]] = (int32_t)idx[b];
    }
  }
  return deg_max;
}

}  // extern "C"
