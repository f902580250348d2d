// Native GGUF tensor streaming + dequantization.
//
// C++ counterpart of the runtime's weight-loading hot path: the reference
// streams tensors with fseek/fread + ggml dequant traits
// (src/gguf_loader.cpp:153-226, src/tts_transformer.cpp:733-792); here
// Python mmaps the file (io/gguf.py raw_tensor) and this library
// dequantizes quantized blocks (Q8_0 / Q4_0 / Q4_K) or widens F16/BF16
// to f32/bf16 with a thread pool, writing straight into a
// caller-provided buffer (a numpy array that JAX then device_puts).
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).
//
// Build: make -C qwen3_tts_tpu/native

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <thread>
#include <vector>

namespace {

// GGML type ids (subset; must match io/gguf.py)
enum GType : int32_t {
    T_F32 = 0,
    T_F16 = 1,
    T_Q4_0 = 2,
    T_Q8_0 = 8,
    T_Q4_K = 12,
    T_BF16 = 30,
};

inline float f16_to_f32(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000u) << 16;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t mant = h & 0x3FF;
    uint32_t out;
    if (exp == 0) {
        if (mant == 0) {
            out = sign;
        } else {
            // subnormal: normalize
            int shift = 0;
            while (!(mant & 0x400)) { mant <<= 1; ++shift; }
            mant &= 0x3FF;
            out = sign | ((127 - 15 - shift + 1) << 23) | (mant << 13);
        }
    } else if (exp == 0x1F) {
        out = sign | 0x7F800000u | (mant << 13);
    } else {
        out = sign | ((exp - 15 + 127) << 23) | (mant << 13);
    }
    float f;
    std::memcpy(&f, &out, 4);
    return f;
}

inline uint16_t f32_to_bf16(float f) {
    uint32_t bits;
    std::memcpy(&bits, &f, 4);
    if ((bits & 0x7F800000u) == 0x7F800000u && (bits & 0x007FFFFFu)) {
        // NaN: keep it a NaN (quiet). Rounding a small-payload NaN would
        // carry into the exponent and emit +/-Inf, masking checkpoint
        // corruption the numpy fallback path surfaces.
        return (uint16_t)((bits >> 16) | 0x0040u);
    }
    // round-to-nearest-even
    uint32_t rounding = 0x7FFFu + ((bits >> 16) & 1u);
    return (uint16_t)((bits + rounding) >> 16);
}

// ---- per-block dequantizers (one 32/256-element block -> f32) ----------

inline void dq_q8_0(const uint8_t* src, float* dst) {
    float d = f16_to_f32(*(const uint16_t*)src);
    const int8_t* q = (const int8_t*)(src + 2);
    for (int i = 0; i < 32; ++i) dst[i] = d * (float)q[i];
}

inline void dq_q4_0(const uint8_t* src, float* dst) {
    float d = f16_to_f32(*(const uint16_t*)src);
    const uint8_t* q = src + 2;
    for (int i = 0; i < 16; ++i) {
        dst[i]      = d * (float)((int)(q[i] & 0x0F) - 8);
        dst[i + 16] = d * (float)((int)(q[i] >> 4) - 8);
    }
}

inline void dq_q4_k(const uint8_t* src, float* dst) {
    float d = f16_to_f32(*(const uint16_t*)(src + 0));
    float dmin = f16_to_f32(*(const uint16_t*)(src + 2));
    const uint8_t* sc = src + 4;    // 12 bytes of 6-bit scales/mins
    const uint8_t* qs = src + 16;   // 128 bytes of nibbles

    float scales[8], mins[8];
    for (int j = 0; j < 8; ++j) {
        uint8_t s, m;
        if (j < 4) {
            s = sc[j] & 63;
            m = sc[j + 4] & 63;
        } else {
            s = (uint8_t)((sc[j + 4] & 0x0F) | ((sc[j - 4] >> 6) << 4));
            m = (uint8_t)((sc[j + 4] >> 4) | ((sc[j] >> 6) << 4));
        }
        scales[j] = d * (float)s;
        mins[j] = dmin * (float)m;
    }
    // 4 chunks of 32 bytes; chunk c: low nibbles -> sub-block 2c,
    // high nibbles -> sub-block 2c+1
    for (int c = 0; c < 4; ++c) {
        const uint8_t* q = qs + 32 * c;
        float* lo = dst + 64 * c;
        float* hi = lo + 32;
        float s0 = scales[2 * c], m0 = mins[2 * c];
        float s1 = scales[2 * c + 1], m1 = mins[2 * c + 1];
        for (int i = 0; i < 32; ++i) {
            lo[i] = s0 * (float)(q[i] & 0x0F) - m0;
            hi[i] = s1 * (float)(q[i] >> 4) - m1;
        }
    }
}

struct TypeInfo { int64_t block_elems; int64_t block_bytes; };

bool type_info(int32_t t, TypeInfo* out) {
    switch (t) {
        case T_F32:  *out = {1, 4}; return true;
        case T_F16:  *out = {1, 2}; return true;
        case T_BF16: *out = {1, 2}; return true;
        case T_Q8_0: *out = {32, 34}; return true;
        case T_Q4_0: *out = {32, 18}; return true;
        case T_Q4_K: *out = {256, 144}; return true;
        default: return false;
    }
}

template <typename Fn>
void parallel_blocks(int64_t n_blocks, int n_threads, Fn fn) {
    if (n_threads <= 1 || n_blocks < 1024) {
        fn(0, n_blocks);
        return;
    }
    std::vector<std::thread> threads;
    int64_t per = (n_blocks + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        int64_t lo = t * per;
        int64_t hi = std::min(n_blocks, lo + per);
        if (lo >= hi) break;
        threads.emplace_back([=] { fn(lo, hi); });
    }
    for (auto& th : threads) th.join();
}

inline void dequant_one_block(const uint8_t* s, int32_t gtype, float* d) {
    switch (gtype) {
        case T_F32:
            std::memcpy(d, s, 4);
            break;
        case T_F16:
            *d = f16_to_f32(*(const uint16_t*)s);
            break;
        case T_BF16: {
            uint32_t bits = ((uint32_t)(*(const uint16_t*)s)) << 16;
            std::memcpy(d, &bits, 4);
            break;
        }
        case T_Q8_0: dq_q8_0(s, d); break;
        case T_Q4_0: dq_q4_0(s, d); break;
        case T_Q4_K: dq_q4_k(s, d); break;
    }
}

void dequant_range_f32(const uint8_t* src, int32_t gtype, float* dst,
                       int64_t blk_lo, int64_t blk_hi) {
    TypeInfo ti;
    type_info(gtype, &ti);
    for (int64_t b = blk_lo; b < blk_hi; ++b) {
        dequant_one_block(src + b * ti.block_bytes, gtype,
                          dst + b * ti.block_elems);
    }
}

}  // namespace

extern "C" {

// Dequantize a raw GGUF tensor payload to float32.
// Returns 0 on success, nonzero on unsupported type / size mismatch.
int q3t_dequant_f32(const uint8_t* src, int64_t src_bytes, int32_t gtype,
                    int64_t n_elements, float* dst, int32_t n_threads) {
    TypeInfo ti;
    if (!type_info(gtype, &ti)) return 1;
    if (n_elements % ti.block_elems != 0) return 2;
    int64_t n_blocks = n_elements / ti.block_elems;
    if (n_blocks * ti.block_bytes > src_bytes) return 3;
    if (n_threads <= 0) {
        n_threads = (int32_t)std::thread::hardware_concurrency();
    }
    parallel_blocks(n_blocks, n_threads, [&](int64_t lo, int64_t hi) {
        dequant_range_f32(src, gtype, dst, lo, hi);
    });
    return 0;
}

// Dequantize to bfloat16 (as uint16 payload).
int q3t_dequant_bf16(const uint8_t* src, int64_t src_bytes, int32_t gtype,
                     int64_t n_elements, uint16_t* dst, int32_t n_threads) {
    TypeInfo ti;
    if (!type_info(gtype, &ti)) return 1;
    if (n_elements % ti.block_elems != 0) return 2;
    int64_t n_blocks = n_elements / ti.block_elems;
    if (n_blocks * ti.block_bytes > src_bytes) return 3;
    if (n_threads <= 0) {
        n_threads = (int32_t)std::thread::hardware_concurrency();
    }
    parallel_blocks(n_blocks, n_threads, [&](int64_t lo, int64_t hi) {
        // dequant via a small f32 scratch per block, then round to bf16
        float scratch[256];
        for (int64_t b = lo; b < hi; ++b) {
            dequant_one_block(src + b * ti.block_bytes, gtype, scratch);
            uint16_t* d = dst + b * ti.block_elems;
            for (int64_t i = 0; i < ti.block_elems; ++i) {
                d[i] = f32_to_bf16(scratch[i]);
            }
        }
    });
    return 0;
}


// Linear resampler (float mono), mirroring qwen3_tts.cpp:83-101 semantics.
int64_t q3t_resample_linear(const float* input, int64_t input_len,
                            int32_t input_rate, float* output,
                            int64_t output_cap, int32_t output_rate) {
    double ratio = (double)input_rate / (double)output_rate;
    int64_t out_len = (int64_t)((double)input_len / ratio);
    if (out_len > output_cap) return -1;
    for (int64_t i = 0; i < out_len; ++i) {
        double src = (double)i * ratio;
        int64_t i0 = (int64_t)src;
        int64_t i1 = i0 + 1;
        double frac = src - (double)i0;
        output[i] = (i1 >= input_len)
            ? input[input_len - 1]
            : (float)((1.0 - frac) * input[i0] + frac * input[i1]);
    }
    return out_len;
}

}  // extern "C"
