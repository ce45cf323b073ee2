// Native host-side runtime for nemotron_tpu.
//
// The TPU does all model math; what remains on the host at high stream counts
// is byte-moving and O(samples) DSP bookkeeping. These are the hot host paths,
// implemented in C++ and bound via ctypes (the reference keeps the analogous
// code in C++ too: src/preprocessor.cpp buffering, src/nemo-server.cpp framing).
//
// Exposed C ABI:
//   pcm_i16_to_f32_preemph : s16le -> f32 scale 1/32768 + pre-emphasis carry
//   preemph_f32            : pre-emphasis on already-float audio
//   frame_signal           : strided copy into [n_frames, frame_len] windows
//   wire_parse             : scan a byte buffer for complete protocol frames
//                            ([u8 opcode][u32 id][u32 len][payload], LE)
//
// Build: g++ -O3 -shared -fPIC -o libnemotron_host.so nemotron_host.cpp

#include <cstdint>
#include <cstring>

extern "C" {

// Convert s16le PCM to f32 in [-1, 1] and apply pre-emphasis with a carried
// previous sample. Returns the new carry (the last raw sample, scaled).
// Matches src/preprocessor.cpp:344-356 semantics.
float pcm_i16_to_f32_preemph(
    const int16_t* in, int64_t n, float preemph, float last_sample,
    float* out)
{
    const float scale = 1.0f / 32768.0f;
    float prev = last_sample;
    for (int64_t i = 0; i < n; i++) {
        const float cur = in[i] * scale;
        out[i] = cur - preemph * prev;
        prev = cur;
    }
    return prev;
}

// Pre-emphasis on float input (same carry contract).
float preemph_f32(
    const float* in, int64_t n, float preemph, float last_sample, float* out)
{
    float prev = last_sample;
    for (int64_t i = 0; i < n; i++) {
        const float cur = in[i];
        out[i] = cur - preemph * prev;
        prev = cur;
    }
    return prev;
}

// Extract overlapping frames: out[t, :] = in[t*hop : t*hop + frame_len].
// Caller guarantees n_in >= (n_frames-1)*hop + frame_len.
void frame_signal(
    const float* in, int64_t n_frames, int64_t hop, int64_t frame_len,
    float* out)
{
    for (int64_t t = 0; t < n_frames; t++) {
        std::memcpy(out + t * frame_len, in + t * hop,
                    (size_t)frame_len * sizeof(float));
    }
}

// Parse as many complete wire frames as possible from buf[0..n).
// For each frame i < max_frames writes (opcode, stream_id, payload_off,
// payload_len) into the parallel output arrays. Returns the number of frames
// parsed; *consumed is the byte offset where parsing stopped (start of the
// first incomplete frame).
int64_t wire_parse(
    const uint8_t* buf, int64_t n, int64_t max_frames,
    uint8_t* opcodes, uint32_t* stream_ids,
    int64_t* payload_offs, uint32_t* payload_lens,
    int64_t* consumed)
{
    int64_t off = 0;
    int64_t count = 0;
    while (count < max_frames && n - off >= 9) {
        const uint8_t opcode = buf[off];
        const uint32_t sid = (uint32_t)buf[off + 1]
                           | ((uint32_t)buf[off + 2] << 8)
                           | ((uint32_t)buf[off + 3] << 16)
                           | ((uint32_t)buf[off + 4] << 24);
        const uint32_t len = (uint32_t)buf[off + 5]
                           | ((uint32_t)buf[off + 6] << 8)
                           | ((uint32_t)buf[off + 7] << 16)
                           | ((uint32_t)buf[off + 8] << 24);
        if (n - off - 9 < (int64_t)len) break;
        opcodes[count] = opcode;
        stream_ids[count] = sid;
        payload_offs[count] = off + 9;
        payload_lens[count] = len;
        off += 9 + (int64_t)len;
        count++;
    }
    *consumed = off;
    return count;
}

}  // extern "C"
