// Native host-pipeline core: fused per-modality normalize + channel flip +
// pad in a single pass over the image.
//
// Rationale: the reference's hot host loop is cv2/numpy preprocessing of
// 1024^2 x 6-channel float images (SURVEY.md 3.1 "dataloader cv2 ops");
// the numpy expression of Normalize_multimodal + Pad_multimodal makes ~6
// full passes over 25 MB. This kernel does one read + one write, fusing:
//   per modality slice: optional /255 (norm_by_max), optional BGR->RGB
//   channel flip, (x - mean) / std; then bottom/right zero padding.
//
// Exposed via a C ABI for ctypes (no pybind11 dependency). Built by
// native/build.sh; python side: multimodal_sam_adapter_tpu/data/native.py
// (falls back to the numpy path when the .so is absent).

#include <cstdint>
#include <cstring>

extern "C" {

// img:    (h, w, c) float32, modality channels concatenated
// out:    (out_h, out_w, c) float32, pre-zeroed not required
// n_mod:  number of modalities; ch[i] channels of modality i
// mean/std: concatenated per-channel stats (AFTER any flip), length c
// flip[i]: nonzero -> reverse the channel order within modality i
// div255[i]: nonzero -> divide modality i by 255 first
// pad_val: fill value for padded area (labels use a separate path)
void msa_normalize_pad(
    const float* img, int h, int w, int c,
    float* out, int out_h, int out_w,
    int n_mod, const int* ch,
    const float* mean, const float* stdev,
    const int* flip, const int* div255,
    float pad_val)
{
    // precompute per-source-channel: destination channel, scale, bias
    // dst = (src * pre_scale - mean[dst]) / std[dst]
    int src2dst[64];
    float pre_scale[64];
    int base = 0;
    for (int m = 0; m < n_mod; ++m) {
        for (int j = 0; j < ch[m]; ++j) {
            int src = base + j;
            int dst = flip[m] ? (base + ch[m] - 1 - j) : src;
            src2dst[src] = dst;
            pre_scale[src] = div255[m] ? (1.0f / 255.0f) : 1.0f;
        }
        base += ch[m];
    }

    for (int y = 0; y < out_h; ++y) {
        float* orow = out + (int64_t)y * out_w * c;
        if (y >= h) {
            for (int i = 0; i < out_w * c; ++i) orow[i] = pad_val;
            continue;
        }
        const float* irow = img + (int64_t)y * w * c;
        for (int x = 0; x < out_w; ++x) {
            float* opx = orow + (int64_t)x * c;
            if (x >= w) {
                for (int k = 0; k < c; ++k) opx[k] = pad_val;
                continue;
            }
            const float* ipx = irow + (int64_t)x * c;
            for (int k = 0; k < c; ++k) {
                int d = src2dst[k];
                opx[d] = (ipx[k] * pre_scale[k] - mean[d]) / stdev[d];
            }
        }
    }
}

// label pad: (h, w) uint8 -> (out_h, out_w) with pad_val
void msa_pad_label(
    const uint8_t* lab, int h, int w,
    uint8_t* out, int out_h, int out_w, uint8_t pad_val)
{
    for (int y = 0; y < out_h; ++y) {
        uint8_t* orow = out + (int64_t)y * out_w;
        if (y >= h) {
            memset(orow, pad_val, out_w);
            continue;
        }
        memcpy(orow, lab + (int64_t)y * w, w);
        if (out_w > w) memset(orow + w, pad_val, out_w - w);
    }
}

}  // extern "C"
