// Native host-side runtime kernels for diffsbdd_tpu.
//
// The TPU compute path is JAX/XLA/Pallas; these C++ kernels cover the
// host-side hot loops around it (the reference delegates the analogous work
// to torch/RDKit native code):
//
//   * pad_collate      — flat ragged complex arrays -> padded fixed-shape
//                        batches (the data-loader inner loop;
//                        reference collate: dataset.py:52-70)
//   * perceive_bonds   — EDM distance-table bond perception over all atom
//                        pairs (molecule building during evaluation;
//                        reference: analysis/molecule_builder.py:30-55)
//
// Exposed with a plain C ABI and loaded via ctypes
// (diffsbdd_tpu/native.py); build with `make -C native`.

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Fill padded per-complex buffers from flat concatenated arrays.
//
// coords:   (total_nodes, 3) float32        one_hot: (total_nodes, nf)
// offsets:  (batch+1,) int64 — node range of complex b is
//           [offsets[b], offsets[b+1])
// out_x:    (batch, n_max, 3)  out_oh: (batch, n_max, nf)
// out_mask: (batch, n_max)     out_size: (batch,)
// Returns 0 on success, -1 if any complex exceeds n_max.
static int pad_collate_impl(const float* coords, const float* one_hot,
                            const int64_t* offsets, const int64_t* indices,
                            int64_t batch, int64_t n_max, int64_t nf,
                            float* out_x, float* out_oh, float* out_mask,
                            int32_t* out_size) {
  std::memset(out_x, 0, sizeof(float) * batch * n_max * 3);
  std::memset(out_oh, 0, sizeof(float) * batch * n_max * nf);
  std::memset(out_mask, 0, sizeof(float) * batch * n_max);
  for (int64_t b = 0; b < batch; ++b) {
    const int64_t c = indices ? indices[b] : b;
    const int64_t start = offsets[c];
    const int64_t n = offsets[c + 1] - start;
    if (n > n_max) return -1;
    std::memcpy(out_x + b * n_max * 3, coords + start * 3,
                sizeof(float) * n * 3);
    std::memcpy(out_oh + b * n_max * nf, one_hot + start * nf,
                sizeof(float) * n * nf);
    for (int64_t i = 0; i < n; ++i) out_mask[b * n_max + i] = 1.0f;
    out_size[b] = static_cast<int32_t>(n);
  }
  return 0;
}

int pad_collate(const float* coords, const float* one_hot,
                const int64_t* offsets, int64_t batch, int64_t n_max,
                int64_t nf, float* out_x, float* out_oh, float* out_mask,
                int32_t* out_size) {
  return pad_collate_impl(coords, one_hot, offsets, nullptr, batch, n_max,
                          nf, out_x, out_oh, out_mask, out_size);
}

// EDM bond perception: for every unordered atom pair (i > j), assign the
// highest bond order whose tabulated length (+ margin) exceeds the distance.
// Tables are (n_types, n_types) bond lengths in pm; margins in pm.
// Emits up to max_bonds (i, j, order) triples; returns the count, or -1 if
// the output buffer is too small.
int perceive_bonds(const float* coords, const int32_t* types, int64_t n_atoms,
                   const double* bonds1, const double* bonds2,
                   const double* bonds3, int64_t n_types, double margin1,
                   double margin2, double margin3, int32_t* out_bonds,
                   int64_t max_bonds) {
  int64_t count = 0;
  for (int64_t i = 1; i < n_atoms; ++i) {
    const int32_t ti = types[i];
    for (int64_t j = 0; j < i; ++j) {
      const int32_t tj = types[j];
      const double dx = coords[i * 3] - coords[j * 3];
      const double dy = coords[i * 3 + 1] - coords[j * 3 + 1];
      const double dz = coords[i * 3 + 2] - coords[j * 3 + 2];
      const double d_pm = 100.0 * std::sqrt(dx * dx + dy * dy + dz * dz);
      const int64_t idx = static_cast<int64_t>(ti) * n_types + tj;
      // same precedence as the reference: single, then double, then triple
      // overwrite (molecule_builder.py:44-53)
      int order = 0;
      if (d_pm < bonds1[idx] + margin1) order = 1;
      if (d_pm < bonds2[idx] + margin2) order = 2;
      if (d_pm < bonds3[idx] + margin3) order = 3;
      if (order > 0) {
        if (count >= max_bonds) return -1;
        out_bonds[count * 3] = static_cast<int32_t>(i);
        out_bonds[count * 3 + 1] = static_cast<int32_t>(j);
        out_bonds[count * 3 + 2] = order;
        ++count;
      }
    }
  }
  return static_cast<int>(count);
}

}  // extern "C"

extern "C" {

// Gather-collate: pad a *shuffled* batch selected by complex indices.
// indices: (batch,) int64 complex ids; the rest as pad_collate.
int pad_collate_gather(const float* coords, const float* one_hot,
                       const int64_t* offsets, const int64_t* indices,
                       int64_t batch, int64_t n_max, int64_t nf, float* out_x,
                       float* out_oh, float* out_mask, int32_t* out_size) {
  return pad_collate_impl(coords, one_hot, offsets, indices, batch, n_max,
                          nf, out_x, out_oh, out_mask, out_size);
}

}  // extern "C"
