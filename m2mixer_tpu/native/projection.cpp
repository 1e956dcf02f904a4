// Native host-side text-projection kernel.
//
// The pNLP projection (per-word MinHash min-reduce -> counting-Bloom
// scatter -> windowed context concat; see m2mixer_tpu/utils/projection.py
// and the reference math at /root/reference/utils/projection.py) runs on
// the host for every text sample. The numpy path allocates several
// intermediates per sample; this kernel does the whole projection in one
// cache-friendly pass so the input pipeline can't starve the TPU.
//
// Build: see Makefile (g++ -O3 -shared -fPIC). Loaded via ctypes; the
// Python fallback stays available when the library isn't built.

#include <cstdint>
#include <cstring>

extern "C" {

// token_rows: (total_tokens, num_hashes) int32 fingerprints, word-major.
// word_offsets: (n_words + 1) int64 prefix offsets into token_rows.
// out: (n_words, (2*window+1)*feature_size) float32, zero-initialized here.
void project_words(const int32_t* token_rows,
                   const int64_t* word_offsets,
                   int64_t n_words,
                   int64_t num_hashes,
                   int64_t feature_size,
                   int64_t window,
                   float* out) {
  const int64_t out_width = (2 * window + 1) * feature_size;
  std::memset(out, 0, sizeof(float) * n_words * out_width);
  if (n_words == 0) return;

  // Phase 1: per-word min-reduce over its tokens' fingerprints, then
  // scatter (value mod feature_size) into the word's CENTER block.
  // The center block of word w lives at out[w][window*feature_size ...].
  for (int64_t w = 0; w < n_words; ++w) {
    const int64_t begin = word_offsets[w];
    const int64_t end = word_offsets[w + 1];
    float* center = out + w * out_width + window * feature_size;
    for (int64_t h = 0; h < num_hashes; ++h) {
      int32_t m = INT32_MAX;
      for (int64_t t = begin; t < end; ++t) {
        const int32_t v = token_rows[t * num_hashes + h];
        if (v < m) m = v;
      }
      int64_t bucket = static_cast<int64_t>(m) % feature_size;
      if (bucket < 0) bucket += feature_size;
      center[bucket] += 1.0f;
    }
  }

  // Phase 2: windowed context — copy neighbor center blocks into the
  // surrounding slots (slot k of word w holds word (w + k - window)).
  if (window > 0) {
    for (int64_t w = 0; w < n_words; ++w) {
      float* row = out + w * out_width;
      for (int64_t k = 0; k < 2 * window + 1; ++k) {
        if (k == window) continue;
        const int64_t src = w + k - window;
        if (src < 0 || src >= n_words) continue;
        const float* src_center = out + src * out_width + window * feature_size;
        std::memcpy(row + k * feature_size, src_center,
                    sizeof(float) * feature_size);
      }
    }
  }
}

// Batched counting-Bloom scatter without windowing: fingerprints
// (n, num_hashes) -> counts (n, feature_size). Used by tests and by any
// caller that wants the raw CBF features.
void cbf_scatter(const int32_t* fingerprints,
                 int64_t n,
                 int64_t num_hashes,
                 int64_t feature_size,
                 float* out) {
  std::memset(out, 0, sizeof(float) * n * feature_size);
  for (int64_t i = 0; i < n; ++i) {
    float* row = out + i * feature_size;
    const int32_t* fp = fingerprints + i * num_hashes;
    for (int64_t h = 0; h < num_hashes; ++h) {
      int64_t bucket = static_cast<int64_t>(fp[h]) % feature_size;
      if (bucket < 0) bucket += feature_size;
      row[bucket] += 1.0f;
    }
  }
}

}  // extern "C"
