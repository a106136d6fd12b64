// Native streaming framer: ring buffer + overlap-save block emission.
//
// TPU-native counterpart of the reference's native streaming driver
// (/root/reference/src/pffastconv.c:133-263): the host-side loop that
// carries unconsumed tail samples between calls and cuts the stream into
// overlapping FFT blocks.  On TPU the compute is a fixed-shape batched
// kernel; this framer feeds it: arbitrary-size chunks in, aligned
// [num_frames, frame_len] float batches (stride = hop, overlap carried)
// out, with 64-byte-aligned storage (pffft_common.c:12 Valigned_malloc
// parity).  Single-producer single-consumer per instance; instances are
// independent (the reference's "setup not thread-shareable" contract,
// pffastconv.h:77-80, becomes "one framer per stream").

#include <cstdint>
#include <cstdlib>
#include <cstring>

namespace {

struct Ring {
  float* buf;        // aligned storage, capacity floats
  uint64_t capacity; // power of two
  uint64_t head;     // absolute write position (monotonic)
  uint64_t tail;     // absolute read position (monotonic; frames start here)
};

void* aligned_malloc(size_t bytes) {
#if defined(_ISOC11_SOURCE) || (__STDC_VERSION__ >= 201112L)
  size_t rounded = (bytes + 63) & ~(size_t)63;
  return aligned_alloc(64, rounded);
#else
  void* p = nullptr;
  if (posix_memalign(&p, 64, bytes) != 0) return nullptr;
  return p;
#endif
}

uint64_t next_pow2(uint64_t n) {
  uint64_t p = 1;
  while (p < n) p <<= 1;
  return p;
}

}  // namespace

extern "C" {

// capacity_hint: minimum number of float samples the ring must hold.
void* pftpu_ring_new(uint64_t capacity_hint) {
  Ring* r = (Ring*)std::malloc(sizeof(Ring));
  if (!r) return nullptr;
  r->capacity = next_pow2(capacity_hint < 1024 ? 1024 : capacity_hint);
  r->buf = (float*)aligned_malloc(r->capacity * sizeof(float));
  if (!r->buf) {
    std::free(r);
    return nullptr;
  }
  r->head = 0;
  r->tail = 0;
  return r;
}

void pftpu_ring_free(void* ring) {
  if (!ring) return;
  Ring* r = (Ring*)ring;
  std::free(r->buf);
  std::free(r);
}

uint64_t pftpu_ring_size(void* ring) {
  Ring* r = (Ring*)ring;
  return r->head - r->tail;
}

uint64_t pftpu_ring_capacity(void* ring) { return ((Ring*)ring)->capacity; }

// Append n samples; returns samples written (may be < n if full).
uint64_t pftpu_ring_write(void* ring, const float* data, uint64_t n) {
  Ring* r = (Ring*)ring;
  const uint64_t free_space = r->capacity - (r->head - r->tail);
  if (n > free_space) n = free_space;
  const uint64_t mask = r->capacity - 1;
  uint64_t pos = r->head & mask;
  const uint64_t first = (n < r->capacity - pos) ? n : r->capacity - pos;
  std::memcpy(r->buf + pos, data, first * sizeof(float));
  if (n > first) std::memcpy(r->buf, data + first, (n - first) * sizeof(float));
  r->head += n;
  return n;
}

// Emit up to max_frames overlapped frames of length frame_len advancing by
// hop (hop <= frame_len; overlap = frame_len - hop stays buffered).
// out must hold max_frames*frame_len floats.  Returns frames emitted and
// consumes frames*hop samples from the ring.
uint64_t pftpu_ring_read_frames(void* ring, float* out, uint64_t frame_len,
                                uint64_t hop, uint64_t max_frames) {
  if (hop == 0 || frame_len == 0 || hop > frame_len) return 0;
  Ring* r = (Ring*)ring;
  const uint64_t mask = r->capacity - 1;
  uint64_t frames = 0;
  while (frames < max_frames && (r->head - r->tail) >= frame_len) {
    const uint64_t start = r->tail & mask;
    const uint64_t first =
        (frame_len < r->capacity - start) ? frame_len : r->capacity - start;
    std::memcpy(out, r->buf + start, first * sizeof(float));
    if (frame_len > first)
      std::memcpy(out + first, r->buf, (frame_len - first) * sizeof(float));
    out += frame_len;
    r->tail += hop;
    ++frames;
  }
  return frames;
}

// Drain the remaining (< frame_len) samples zero-padded into one frame.
// Returns the number of real samples placed (0 if empty).
uint64_t pftpu_ring_flush_frame(void* ring, float* out, uint64_t frame_len) {
  Ring* r = (Ring*)ring;
  const uint64_t avail = r->head - r->tail;
  if (avail == 0) return 0;
  const uint64_t n = avail < frame_len ? avail : frame_len;
  const uint64_t mask = r->capacity - 1;
  const uint64_t start = r->tail & mask;
  const uint64_t first = (n < r->capacity - start) ? n : r->capacity - start;
  std::memcpy(out, r->buf + start, first * sizeof(float));
  if (n > first) std::memcpy(out + first, r->buf, (n - first) * sizeof(float));
  if (n < frame_len)
    std::memset(out + n, 0, (frame_len - n) * sizeof(float));
  r->tail += n;
  return n;
}

}  // extern "C"
