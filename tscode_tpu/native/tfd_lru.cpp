// Sequential TFD novelty filter (native form of ops/tfd.is_new_structure_lru,
// itself the replay of reference embeds.py:47-69): iterate poses in
// generation order; accept a pose when its torsion fingerprint differs from
// EVERY previously accepted one by at least `thresh` total wrapped-L1
// degrees. The loop is inherently sequential (each acceptance extends the
// cache), which makes it a host bottleneck at production ensemble sizes in
// interpreted code — here it runs as a tight scalar loop with early exit on
// the (monotone, nonnegative) partial sums.
//
// Contract: fps (B, Q) float32 row-major; accept (B,) uint8 pre-filter
// (e.g. the clash mask); out (B,) uint8. Returns the number accepted.

#include <cstdint>
#include <cmath>

extern "C" int64_t tfd_lru_filter(const float* fps, int64_t B, int64_t Q,
                                  const uint8_t* accept, double thresh,
                                  uint8_t* out) {
    // cache holds row indices of accepted fingerprints
    int64_t* cache = new int64_t[B];
    int64_t n_cache = 0;

    for (int64_t i = 0; i < B; ++i) {
        out[i] = 0;
        if (!accept[i]) continue;
        const float* fi = fps + i * Q;
        bool novel = true;
        for (int64_t c = 0; c < n_cache && novel; ++c) {
            const float* fc = fps + cache[c] * Q;
            double s = 0.0;
            for (int64_t q = 0; q < Q; ++q) {
                double d = std::fabs(double(fi[q]) - double(fc[q]));
                if (d > 180.0) d = std::fabs(d - 360.0);
                s += d;
                if (s >= thresh) break;     // terms are nonnegative
            }
            if (s < thresh) novel = false;
        }
        if (novel) {
            out[i] = 1;
            cache[n_cache++] = i;
        }
    }
    delete[] cache;
    return n_cache;
}
