// Host-side map-store runtime: slot allocation, eviction choice,
// landmark free-row scanning, and observation partitioning for the
// mesh-sharded BA.
//
// This is the native counterpart of the reference's C++ `Memory`
// singleton (src/Basic/Memory.cpp) and of the host prep loops that
// feed the TPU: the device holds MapState tensors, Python orchestrates,
// and these routines do the integer-heavy bookkeeping that would
// otherwise be Python loops (keyframe-rate, but O(K*L) / O(obs)).
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <algorithm>
#include <vector>

extern "C" {

// Pick a keyframe slot: first free slot in [0, K), else the used slot
// least covisible with `ref_slot` (excluding `ref_slot` and
// `newest_slot`).  `used` is a 0/1 array of length K; `cov` is the
// row-major [K, K] covisibility matrix.  Returns the slot, and sets
// *evicted = 1 if an eviction is required.
int32_t ms_alloc_kf_slot(const uint8_t* used, const int32_t* cov,
                         int32_t K, int32_t ref_slot, int32_t newest_slot,
                         int32_t* evicted) {
  *evicted = 0;
  for (int32_t s = 0; s < K; ++s) {
    if (!used[s]) return s;
  }
  int32_t victim = -1;
  int32_t best_w = INT32_MAX;
  for (int32_t s = 0; s < K; ++s) {
    if (s == ref_slot || s == newest_slot || !used[s]) continue;
    int32_t w = cov[ref_slot * K + s];
    if (w < best_w) {
      best_w = w;
      victim = s;
    }
  }
  *evicted = 1;
  return victim;
}

// Scan the landmark validity bitmap for up to `want` free rows;
// writes indices into `out` and returns the count found.
int32_t ms_free_rows(const uint8_t* valid, int32_t L, int32_t want,
                     int32_t* out) {
  int32_t n = 0;
  for (int32_t i = 0; i < L && n < want; ++i) {
    if (!valid[i]) out[n++] = i;
  }
  return n;
}

// Partition observations by landmark shard for the distributed BA
// (parallel/sharded_ba.partition_observations's inner loops).
//
// Inputs: O observations (kf_idx, pt_idx, px[2], mask), landmark
// capacity L padded to L_pad = ceil(L / n_shards) * n_shards so shard
// s owns rows [s*Ls, (s+1)*Ls).
// Outputs (caller-allocated, n_shards * o_shard entries each):
// out_kf, out_pt (shard-local), out_px (2 floats per row), out_mask.
// `o_shard` must be >= the max per-shard count; call with
// o_shard == 0 first to query the needed size (returned).
int32_t ms_partition_obs(const int32_t* kf_idx, const int32_t* pt_idx,
                         const float* px, const uint8_t* mask, int32_t O,
                         int32_t L, int32_t n_shards, int32_t o_shard,
                         int32_t* out_kf, int32_t* out_pt, float* out_px,
                         uint8_t* out_mask) {
  const int32_t L_pad = ((L + n_shards - 1) / n_shards) * n_shards;
  const int32_t Ls = L_pad / n_shards;
  std::vector<int32_t> counts(n_shards, 0);
  for (int32_t i = 0; i < O; ++i) {
    if (!mask[i]) continue;
    int32_t s = pt_idx[i] / Ls;
    if (s >= 0 && s < n_shards) counts[s]++;
  }
  int32_t max_count = 1;
  for (int32_t s = 0; s < n_shards; ++s)
    max_count = std::max(max_count, counts[s]);
  if (o_shard == 0) return max_count;  // size query

  std::memset(out_mask, 0, (size_t)n_shards * o_shard);
  std::vector<int32_t> fill(n_shards, 0);
  for (int32_t i = 0; i < O; ++i) {
    if (!mask[i]) continue;
    int32_t s = pt_idx[i] / Ls;
    if (s < 0 || s >= n_shards) continue;
    int32_t k = fill[s]++;
    if (k >= o_shard) continue;  // caller sized too small; drop
    int64_t row = (int64_t)s * o_shard + k;
    out_kf[row] = kf_idx[i];
    out_pt[row] = pt_idx[i] - s * Ls;
    out_px[row * 2 + 0] = px[i * 2 + 0];
    out_px[row * 2 + 1] = px[i * 2 + 1];
    out_mask[row] = 1;
  }
  // Zero-fill the padding rows' indices for determinism.
  for (int32_t s = 0; s < n_shards; ++s) {
    for (int32_t k = fill[s]; k < o_shard; ++k) {
      int64_t row = (int64_t)s * o_shard + k;
      out_kf[row] = 0;
      out_pt[row] = 0;
      out_px[row * 2 + 0] = 0.f;
      out_px[row * 2 + 1] = 0.f;
    }
  }
  return max_count;
}

// Keyframe-redundancy eviction scores: fraction of each keyframe's
// linked landmarks that are observed by >= min_obs keyframes
// (KeyFrameCulling's 90% redundancy rule, LocalMapping.cpp:579-618).
// feat_point: [K*F] landmark links (-1 none); pt_obs: [L] counts;
// out: [K] scores.
void ms_kf_redundancy(const int32_t* feat_point, const uint8_t* feat_valid,
                      const int32_t* pt_obs, int32_t K, int32_t F,
                      int32_t L, int32_t min_obs, float* out) {
  for (int32_t k = 0; k < K; ++k) {
    int32_t linked = 0, redundant = 0;
    for (int32_t f = 0; f < F; ++f) {
      int32_t p = feat_point[k * F + f];
      if (!feat_valid[k * F + f] || p < 0 || p >= L) continue;
      linked++;
      if (pt_obs[p] >= min_obs) redundant++;
    }
    out[k] = linked > 0 ? (float)redundant / (float)linked : 0.f;
  }
}

// Scale-aware keyframe-redundancy scores: an observation of landmark
// p at pyramid level l only counts as redundant when >= min_obs
// keyframes observe p at a FINER-OR-EQUAL level.  NOTE: this is an
// ORB-SLAM2-style refinement (scaleLeveli <= scaleLevel + 1) that
// goes BEYOND the reference's KeyFrameCulling, which counts
// observations with a flat th_obs=3 and no level check
// (LocalMapping.cpp:592-607); the stricter rule avoids culling
// keyframes whose coarse observations are only "covered" by even
// coarser ones.
// feat_level: [K*F] per-feature detection levels.
void ms_kf_redundancy_scale(const int32_t* feat_point,
                            const uint8_t* feat_valid,
                            const int32_t* feat_level,
                            int32_t K, int32_t F, int32_t L,
                            int32_t min_obs, float* out) {
  const int32_t MAXLVL = 8;
  // counts[p * MAXLVL + l] = observations of p at exactly level l.
  int32_t* counts = (int32_t*)calloc((size_t)L * MAXLVL, sizeof(int32_t));
  if (!counts) {
    for (int32_t k = 0; k < K; ++k) out[k] = 0.f;
    return;
  }
  for (int32_t k = 0; k < K; ++k) {
    for (int32_t f = 0; f < F; ++f) {
      int64_t i = (int64_t)k * F + f;
      int32_t p = feat_point[i];
      if (!feat_valid[i] || p < 0 || p >= L) continue;
      int32_t l = feat_level[i];
      if (l < 0) l = 0;
      if (l >= MAXLVL) l = MAXLVL - 1;
      counts[(int64_t)p * MAXLVL + l]++;
    }
  }
  // Prefix over level: counts[p][l] -> observations at level <= l.
  for (int32_t p = 0; p < L; ++p)
    for (int32_t l = 1; l < MAXLVL; ++l)
      counts[(int64_t)p * MAXLVL + l] += counts[(int64_t)p * MAXLVL + l - 1];
  // One level of slack (scaleLevel + 1), per the ORB-SLAM2 rule.
  for (int32_t k = 0; k < K; ++k) {
    int32_t linked = 0, redundant = 0;
    for (int32_t f = 0; f < F; ++f) {
      int64_t i = (int64_t)k * F + f;
      int32_t p = feat_point[i];
      if (!feat_valid[i] || p < 0 || p >= L) continue;
      linked++;
      int32_t l = feat_level[i] + 1;  // finer-or-equal with +1 slack
      if (l < 0) l = 0;
      if (l >= MAXLVL) l = MAXLVL - 1;
      if (counts[(int64_t)p * MAXLVL + l] >= min_obs) redundant++;
    }
    out[k] = linked > 0 ? (float)redundant / (float)linked : 0.f;
  }
  free(counts);
}

}  // extern "C"
