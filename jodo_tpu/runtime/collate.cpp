// Fast padded-batch assembly for the training input pipeline.
//
// The per-step host work (reference: DataLoader workers running Python
// collate_edge, datasets/build_dataset.py:392-421) is, in this framework,
// a single C++ pass over ragged arrays: scatter atom one-hots, positions,
// charges, masks and dense edge features into preallocated padded buffers.
// Called through ctypes from jodo_tpu.runtime with a NumPy fallback.
//
// All index arrays are int64, data arrays float32. Layouts are C-contiguous:
//   one_hot   [B, N, T]
//   positions [B, N, 3]
//   fc        [B, N, 1]
//   edge_feat [B, N, N, E]
//   node_mask [B, N]
//   edge_mask [B, N, N]

#include <cstdint>
#include <cstring>

extern "C" {

void collate_graphs(
    // ragged inputs
    const int64_t* indices, int64_t batch,
    const int64_t* atom_offsets,
    const int16_t* atom_type,
    const int16_t* formal_charge,
    const float* pos,            // may be null
    const int64_t* bond_offsets,
    const int32_t* bond_src,
    const int32_t* bond_dst,
    const int16_t* bond_type,
    // config
    int64_t pad_n, int64_t num_types, int64_t edge_ch,
    int32_t compress_edge, int32_t include_aromatic, int64_t bond_types,
    // outputs (preallocated, zeroed)
    float* one_hot, float* positions, float* fc,
    float* edge_feat, float* node_mask, float* edge_mask) {

  const int64_t nn = pad_n * pad_n;
  for (int64_t k = 0; k < batch; ++k) {
    const int64_t i = indices[k];
    const int64_t a0 = atom_offsets[i];
    const int64_t a1 = atom_offsets[i + 1];
    const int64_t n = a1 - a0;

    float* oh = one_hot + k * pad_n * num_types;
    float* ps = positions + k * pad_n * 3;
    float* fcl = fc + k * pad_n;
    float* nm = node_mask + k * pad_n;
    float* em = edge_mask + k * nn;
    float* ef = edge_feat + k * nn * edge_ch;

    for (int64_t a = 0; a < n; ++a) {
      oh[a * num_types + (int64_t)atom_type[a0 + a]] = 1.0f;
      fcl[a] = (float)formal_charge[a0 + a];
      nm[a] = 1.0f;
    }
    if (pos != nullptr) {
      std::memcpy(ps, pos + a0 * 3, sizeof(float) * 3 * n);
    }

    // edge mask: both endpoints real, diagonal excluded
    for (int64_t r = 0; r < n; ++r) {
      float* row = em + r * pad_n;
      for (int64_t c = 0; c < n; ++c) row[c] = 1.0f;
      row[r] = 0.0f;
    }

    const int64_t b0 = bond_offsets[i];
    const int64_t b1 = bond_offsets[i + 1];
    for (int64_t b = b0; b < b1; ++b) {
      const int64_t s = bond_src[b];
      const int64_t d = bond_dst[b];
      const int64_t t = bond_type[b];
      float* cell = ef + (s * pad_n + d) * edge_ch;
      if (compress_edge) {
        cell[0] = 1.0f;
        cell[1] = (t == 4) ? 0.0f : (float)t / 3.0f;
        if (include_aromatic && t == 4) cell[2] = 1.0f;
      } else {
        if (t >= 1 && t < bond_types) cell[t - 1] = 1.0f;
      }
    }
  }
}

}  // extern "C"
