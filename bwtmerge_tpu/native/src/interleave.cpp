// Streaming run-level interleave of two RLE BWTs by a rank array.
//
// The host backend of the merge phase: equivalent to the reference's
// mergeBWT consumer loop (bwt.cpp:215-282) but over flat run arrays instead of
// byte streams — walks RLE(A) and RLE(B) once, emitting the merged maximal
// runs. Used when the merged output is assembled on the host; the device
// backend (ops/interleave_jax.py) does the same job with segmented scatter.

#include <algorithm>
#include <cstdint>

#define EXPORT extern "C" __attribute__((visibility("default")))

namespace {

struct RunEmitter {
  uint8_t* out_syms;
  int64_t* out_lens;
  int64_t count = 0;
  uint8_t cur_sym = 0;
  int64_t cur_len = 0;

  inline void emit(uint8_t s, int64_t l) {
    if (l == 0) return;
    if (cur_len > 0 && s == cur_sym) {
      cur_len += l;
    } else {
      flush();
      cur_sym = s;
      cur_len = l;
    }
  }

  inline void flush() {
    if (cur_len > 0) {
      out_syms[count] = cur_sym;
      out_lens[count] = cur_len;
      count++;
      cur_len = 0;
    }
  }
};

}  // namespace

// Interleave A and B according to sorted-unique rank-array runs
// (ra_vals strictly increasing, sum(ra_cnts) == |B|).
// Output arrays must have capacity >= na + nb + 2 * nra + 1.
// Returns the number of merged maximal runs.
EXPORT int64_t interleave_runs(const uint8_t* a_syms, const int64_t* a_lens,
                               int64_t na, const uint8_t* b_syms,
                               const int64_t* b_lens, int64_t nb,
                               const int64_t* ra_vals, const int64_t* ra_cnts,
                               int64_t nra, uint8_t* out_syms,
                               int64_t* out_lens) {
  RunEmitter out{out_syms, out_lens};
  int64_t ai = 0, bi = 0;
  int64_t a_rem = (na > 0) ? a_lens[0] : 0;
  int64_t b_rem = (nb > 0) ? b_lens[0] : 0;
  int64_t a_pos = 0;  // text position consumed from A

  for (int64_t t = 0; t < nra; t++) {
    int64_t v = ra_vals[t];
    int64_t k = ra_cnts[t];
    while (a_pos < v) {
      int64_t take = std::min(v - a_pos, a_rem);
      out.emit(a_syms[ai], take);
      a_rem -= take;
      a_pos += take;
      if (a_rem == 0 && ++ai < na) a_rem = a_lens[ai];
    }
    while (k > 0) {
      int64_t take = std::min(k, b_rem);
      out.emit(b_syms[bi], take);
      b_rem -= take;
      k -= take;
      if (b_rem == 0 && ++bi < nb) b_rem = b_lens[bi];
    }
  }
  // Append the rest of A (bwt.cpp:266-276).
  while (ai < na && a_rem > 0) {
    out.emit(a_syms[ai], a_rem);
    if (++ai < na) a_rem = a_lens[ai];
  }
  out.flush();
  return out.count;
}

// -- stateful chunked interleave (out-of-core path) ---------------------------
//
// Consumes the rank array in ascending chunks (RankArraySpill.stream) with
// bounded memory. state layout (int64[7]):
//   [0]=ai  [1]=a_rem  [2]=bi  [3]=b_rem  [4]=a_pos  [5]=cur_sym  [6]=cur_len
// Initialize with interleave_state_init; call interleave_chunk per RA chunk;
// finish with interleave_chunk(nra=0, finish=1) to drain A's tail and flush.
// Output capacity per call must be >= chunk positions + 2*nra + 2.

EXPORT void interleave_state_init(const int64_t* a_lens, int64_t na,
                                  const int64_t* b_lens, int64_t nb,
                                  int64_t* state) {
  state[0] = 0;
  state[1] = (na > 0) ? a_lens[0] : 0;
  state[2] = 0;
  state[3] = (nb > 0) ? b_lens[0] : 0;
  state[4] = 0;
  state[5] = 0;
  state[6] = 0;
}

EXPORT int64_t interleave_chunk(const uint8_t* a_syms, const int64_t* a_lens,
                                int64_t na, const uint8_t* b_syms,
                                const int64_t* b_lens, int64_t nb,
                                const int64_t* ra_vals, const int64_t* ra_cnts,
                                int64_t nra, int64_t finish, int64_t* state,
                                uint8_t* out_syms, int64_t* out_lens) {
  RunEmitter out{out_syms, out_lens};
  int64_t ai = state[0], a_rem = state[1], bi = state[2], b_rem = state[3];
  int64_t a_pos = state[4];
  out.cur_sym = static_cast<uint8_t>(state[5]);
  out.cur_len = state[6];

  for (int64_t t = 0; t < nra; t++) {
    int64_t v = ra_vals[t];
    int64_t k = ra_cnts[t];
    while (a_pos < v) {
      int64_t take = std::min(v - a_pos, a_rem);
      out.emit(a_syms[ai], take);
      a_rem -= take;
      a_pos += take;
      if (a_rem == 0 && ++ai < na) a_rem = a_lens[ai];
    }
    while (k > 0) {
      int64_t take = std::min(k, b_rem);
      out.emit(b_syms[bi], take);
      b_rem -= take;
      k -= take;
      if (b_rem == 0 && ++bi < nb) b_rem = b_lens[bi];
    }
  }
  if (finish) {
    while (ai < na && a_rem > 0) {
      out.emit(a_syms[ai], a_rem);
      if (++ai < na) a_rem = a_lens[ai];
    }
    out.flush();
  }
  state[0] = ai;
  state[1] = a_rem;
  state[2] = bi;
  state[3] = b_rem;
  state[4] = a_pos;
  state[5] = out.cur_sym;
  state[6] = out.cur_len;
  return out.count;
}
