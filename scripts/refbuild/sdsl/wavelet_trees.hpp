// mini-sdsl: a self-contained, byte-compatible subset of the SDSL-lite
// library, sufficient to COMPILE AND RUN the reference bwt-merge
// (jltsiren/bwt-merge) in this offline environment for differential
// testing against bwtmerge_tpu.
//
// Implemented from the published SDSL serialization formats (the same spec
// bwtmerge_tpu/formats/sdsl_compat.py implements and golden-tests):
//   - int_vector<w>: u64 size-in-bits header, data packed LSB-first into
//     little-endian u64 words (plus a u8 width byte when w == 0)
//   - sd_vector<>: u64 m_size, u8 m_wl, m_low (int_vector<0>),
//     m_high (bit_vector), then select_support_mcl structures for the
//     1-bits and 0-bits of m_high
//   - rank/select_support_sd: serialize zero bytes
//   - write_member/read_member: raw little-endian value bytes
//
// Queries favor simplicity over speed (decoded positions + binary search):
// the reference runs here only to produce differential goldens, not
// benchmarks.  This directory is OUR code; nothing is copied from SDSL or
// from the reference.

#pragma once

#include <algorithm>
#include <array>
#include <cassert>
#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <initializer_list>
#include <iostream>
#include <sstream>
#include <string>
#include <unistd.h>
#include <vector>

namespace sdsl {

// -- structure_tree (size accounting only; we discard it) --------------------

struct structure_tree_node {};

struct structure_tree {
  static structure_tree_node* add_child(structure_tree_node*,
                                        const std::string&,
                                        const std::string&) { return nullptr; }
  static void add_size(structure_tree_node*, uint64_t) {}
};

// -- bits ---------------------------------------------------------------------

struct lo_set_proxy {
  uint64_t operator[](size_t i) const {
    return i == 0 ? 0 : (i >= 64 ? ~0ULL : ((1ULL << i) - 1));
  }
};

template <int Unused>
struct bits_tpl {
  static uint64_t hi(uint64_t x) { return x ? 63 - __builtin_clzll(x) : 0; }
  static lo_set_proxy lo_set;   // bits::lo_set[k] = k low bits set
};
template <int Unused> lo_set_proxy bits_tpl<Unused>::lo_set;
typedef bits_tpl<0> bits;

// -- util ---------------------------------------------------------------------

namespace util {
template <class T> std::string class_name(const T&) { return "minisdsl"; }
template <class T> std::string to_string(const T& t) {
  std::ostringstream ss; ss << t; return ss.str();
}
inline uint64_t pid() { return (uint64_t)::getpid(); }
inline uint64_t id() { static uint64_t c = 0; return c++; }
template <class T> void clear(T& x) { T t; x = std::move(t); }
template <class A, class B> void assign(A& a, B b) { a = std::move(b); }
}  // namespace util

// -- low-level bit packing (int_vector serialization layout) ------------------

inline void pack_store(std::vector<uint64_t>& words, uint64_t idx,
                       uint8_t width, uint64_t value) {
  if (width == 0) return;
  uint64_t pos = idx * width, wi = pos >> 6, off = pos & 63;
  uint64_t mask = (width == 64) ? ~0ULL : ((1ULL << width) - 1);
  value &= mask;
  words[wi] |= value << off;
  if (off + width > 64) words[wi + 1] |= value >> (64 - off);
}

inline uint64_t pack_load(const std::vector<uint64_t>& words, uint64_t idx,
                          uint8_t width) {
  if (width == 0) return 0;
  uint64_t pos = idx * width, wi = pos >> 6, off = pos & 63;
  uint64_t mask = (width == 64) ? ~0ULL : ((1ULL << width) - 1);
  uint64_t v = words[wi] >> off;
  if (off + width > 64) v |= words[wi + 1] << (64 - off);
  return v & mask;
}

// serialize a packed sequence with the int_vector framing
inline uint64_t write_packed(std::ostream& out, const std::vector<uint64_t>& vals,
                             uint8_t width, bool fixed) {
  uint64_t bits_n = vals.size() * (uint64_t)width;
  out.write((const char*)&bits_n, 8);
  uint64_t written = 8;
  if (!fixed) { out.write((const char*)&width, 1); written += 1; }
  std::vector<uint64_t> words((bits_n + 63) / 64, 0);
  for (uint64_t i = 0; i < vals.size(); i++) pack_store(words, i, width, vals[i]);
  out.write((const char*)words.data(), 8 * words.size());
  return written + 8 * words.size();
}

inline std::vector<uint64_t> read_packed(std::istream& in, int width_or_m1,
                                         uint8_t* width_out = nullptr) {
  uint64_t bits_n = 0; in.read((char*)&bits_n, 8);
  uint8_t width;
  if (width_or_m1 < 0) in.read((char*)&width, 1);
  else width = (uint8_t)width_or_m1;
  if (width_out) *width_out = width;
  uint64_t count = width ? bits_n / width : 0;
  std::vector<uint64_t> words((bits_n + 63) / 64, 0);
  in.read((char*)words.data(), 8 * words.size());
  std::vector<uint64_t> vals(count);
  for (uint64_t i = 0; i < count; i++) vals[i] = pack_load(words, i, width);
  return vals;
}

// -- int_vector<W> ------------------------------------------------------------

template <uint8_t W>
class int_vector {
 public:
  typedef uint64_t size_type;
  typedef typename std::conditional<W == 8, uint8_t, uint64_t>::type value_type;

  int_vector() {}
  explicit int_vector(size_type n, value_type v = 0, uint8_t = W)
      : data_(n, v) {}
  int_vector(std::initializer_list<uint64_t> init) {
    for (uint64_t v : init) data_.push_back((value_type)v);
  }

  size_type size() const { return data_.size(); }
  void resize(size_type n) { data_.resize(n, 0); }
  value_type& operator[](size_type i) { return data_[i]; }
  const value_type& operator[](size_type i) const { return data_[i]; }
  typename std::vector<value_type>::iterator begin() { return data_.begin(); }
  typename std::vector<value_type>::iterator end() { return data_.end(); }
  typename std::vector<value_type>::const_iterator begin() const { return data_.begin(); }
  typename std::vector<value_type>::const_iterator end() const { return data_.end(); }
  void swap(int_vector& o) { data_.swap(o.data_); }
  bool operator==(const int_vector& o) const { return data_ == o.data_; }
  bool operator!=(const int_vector& o) const { return data_ != o.data_; }

  uint64_t serialize(std::ostream& out, structure_tree_node* = nullptr,
                     std::string = "") const {
    // fixed-width framing: u64 size-in-bits then packed words
    uint64_t bits_n = data_.size() * (uint64_t)W;
    out.write((const char*)&bits_n, 8);
    uint64_t words = (bits_n + 63) / 64;
    std::vector<uint64_t> buf(words, 0);
    std::memcpy(buf.data(), data_.data(), data_.size() * sizeof(value_type));
    out.write((const char*)buf.data(), 8 * words);
    return 8 + 8 * words;
  }
  void load(std::istream& in) {
    uint64_t bits_n = 0; in.read((char*)&bits_n, 8);
    uint64_t count = bits_n / W, words = (bits_n + 63) / 64;
    std::vector<uint64_t> buf(words, 0);
    in.read((char*)buf.data(), 8 * words);
    data_.assign(count, 0);
    std::memcpy(data_.data(), buf.data(), count * sizeof(value_type));
  }

 private:
  std::vector<value_type> data_;
};

template <uint8_t W>
inline uint64_t size_in_bytes(const int_vector<W>& v) {
  std::ostringstream ss; return v.serialize(ss);
}

// -- write_member / read_member ----------------------------------------------

template <class T>
uint64_t write_member(const T& t, std::ostream& out,
                      structure_tree_node* = nullptr, std::string = "") {
  out.write((const char*)&t, sizeof(T));
  return sizeof(T);
}
template <class T> void read_member(T& t, std::istream& in) {
  in.read((char*)&t, sizeof(T));
}

// -- select_support_mcl serialization (construction rules per SDSL) -----------

namespace mcl {
const uint64_t SUPER = 4096;

inline uint64_t write_mcl(std::ostream& out,
                          const std::vector<uint64_t>& args,
                          uint64_t vector_bit_size) {
  uint64_t w = 0;
  uint64_t arg_cnt = args.size();
  out.write((const char*)&arg_cnt, 8); w += 8;
  if (arg_cnt == 0) return w;
  uint64_t padded = ((vector_bit_size + 63) >> 6) << 6;
  uint8_t logn = (uint8_t)(bits::hi(padded) + 1);
  uint64_t logn4 = (uint64_t)logn * logn * logn * logn;
  uint64_t sb = (arg_cnt + SUPER - 1) / SUPER;
  std::vector<uint64_t> superblock(sb);
  std::vector<int> is_long(sb, 0);
  bool has_long = false;
  for (uint64_t i = 0; i < sb; i++) {
    uint64_t lo = i * SUPER, hi = std::min(lo + SUPER, arg_cnt);
    superblock[i] = args[lo];
    if (args[hi - 1] - args[lo] > logn4) { is_long[i] = 1; has_long = true; }
  }
  w += write_packed(out, superblock, logn, false);
  // mini-or-long indicator bit_vector (empty when no long superblocks)
  if (has_long) {
    uint64_t ind_bits = sb;
    out.write((const char*)&ind_bits, 8); w += 8;
    std::vector<uint64_t> ind((sb + 63) / 64, 0);
    for (uint64_t i = 0; i < sb; i++)
      if (!is_long[i]) ind[i >> 6] |= 1ULL << (i & 63);
    out.write((const char*)ind.data(), 8 * ind.size()); w += 8 * ind.size();
  } else {
    uint64_t zero = 0; out.write((const char*)&zero, 8); w += 8;
  }
  for (uint64_t i = 0; i < sb; i++) {
    uint64_t lo = i * SUPER, hi = std::min(lo + SUPER, arg_cnt);
    if (!is_long[i]) {
      uint8_t width = (uint8_t)(bits::hi(args[hi - 1] - args[lo]) + 1);
      std::vector<uint64_t> mini(64, 0);
      uint64_t k = 0;
      for (uint64_t j = lo; j < hi; j += 64) mini[k++] = args[j] - args[lo];
      w += write_packed(out, mini, width, false);
    } else {
      uint8_t width = (uint8_t)(bits::hi(args[hi - 1]) + 1);
      std::vector<uint64_t> vals(SUPER, 0);
      for (uint64_t j = lo; j < hi; j++) vals[j - lo] = args[j];
      w += write_packed(out, vals, width, false);
    }
  }
  return w;
}

inline void skip_mcl(std::istream& in) {
  uint64_t arg_cnt = 0; in.read((char*)&arg_cnt, 8);
  if (arg_cnt == 0) return;
  read_packed(in, -1);                                   // superblock
  { uint64_t b = 0; in.read((char*)&b, 8);               // indicator bits
    std::vector<uint64_t> skip((b + 63) / 64);
    in.read((char*)skip.data(), 8 * skip.size()); }
  uint64_t sb = (arg_cnt + SUPER - 1) / SUPER;
  for (uint64_t i = 0; i < sb; i++) read_packed(in, -1); // mini or long
}
}  // namespace mcl

// -- sd_vector ----------------------------------------------------------------

class sd_vector_builder {
 public:
  sd_vector_builder() : size_(0), capacity_(0) {}
  sd_vector_builder(uint64_t n, uint64_t m) : size_(n), capacity_(m) {
    positions_.reserve(m);
  }
  void set(uint64_t pos) { positions_.push_back(pos); }
  uint64_t size() const { return size_; }
  uint64_t items() const { return positions_.size(); }
  uint64_t capacity() const { return capacity_; }

  std::vector<uint64_t> positions_;
  uint64_t size_;
  uint64_t capacity_;
};

class rank_support_sd;
class select_support_sd;
class select_0_support_sd;
class sd_vector_impl;

class sd_vector_impl {
 public:
  typedef uint64_t size_type;
  typedef rank_support_sd rank_1_type;
  typedef select_support_sd select_1_type;
  typedef select_0_support_sd select_0_type;

  sd_vector_impl() : size_(0) {}
  explicit sd_vector_impl(sd_vector_builder& b)
      : size_(b.size_), positions_(std::move(b.positions_)) {
    b = sd_vector_builder();
  }
  template <class Iter>
  sd_vector_impl(Iter begin, Iter end) {
    // construction from a 0/1 sequence (support.h:316)
    uint64_t i = 0;
    for (Iter it = begin; it != end; ++it, ++i)
      if (*it) positions_.push_back(i);
    size_ = i;
  }

  uint64_t size() const { return size_; }
  uint64_t ones() const { return positions_.size(); }
  int operator[](uint64_t i) const {
    return std::binary_search(positions_.begin(), positions_.end(), i) ? 1 : 0;
  }
  void swap(sd_vector_impl& o) {
    std::swap(size_, o.size_); positions_.swap(o.positions_);
  }

  // Elias-Fano parameters exactly as sd_vector_builder picks them
  uint8_t wl() const {
    uint64_t m = positions_.size(), n = size_;
    uint64_t logm = bits::hi(m) + 1, logn = bits::hi(n) + 1;
    if (logm == logn) logm -= 1;
    return (uint8_t)(logn - logm);
  }

  uint64_t serialize(std::ostream& out, structure_tree_node* = nullptr,
                     std::string = "") const {
    uint64_t w = 0;
    uint64_t m = positions_.size();
    out.write((const char*)&size_, 8); w += 8;
    uint8_t lw = wl();
    out.write((const char*)&lw, 1); w += 1;
    std::vector<uint64_t> low(m);
    uint64_t mask = (lw >= 64) ? ~0ULL : ((1ULL << lw) - 1);
    for (uint64_t i = 0; i < m; i++) low[i] = positions_[i] & mask;
    w += write_packed(out, low, lw, false);
    uint64_t high_len = m + (size_ >> lw) + 1;
    std::vector<uint64_t> ones_pos(m);
    for (uint64_t i = 0; i < m; i++) ones_pos[i] = (positions_[i] >> lw) + i;
    {  // m_high bit_vector
      out.write((const char*)&high_len, 8); w += 8;
      std::vector<uint64_t> words((high_len + 63) / 64, 0);
      for (uint64_t p : ones_pos) words[p >> 6] |= 1ULL << (p & 63);
      out.write((const char*)words.data(), 8 * words.size());
      w += 8 * words.size();
    }
    std::vector<uint64_t> zeros_pos;
    zeros_pos.reserve(high_len - m);
    {
      uint64_t k = 0;
      for (uint64_t p = 0; p < high_len; p++) {
        if (k < m && ones_pos[k] == p) k++;
        else zeros_pos.push_back(p);
      }
    }
    w += mcl::write_mcl(out, ones_pos, high_len);
    w += mcl::write_mcl(out, zeros_pos, high_len);
    return w;
  }

  void load(std::istream& in) {
    in.read((char*)&size_, 8);
    uint8_t lw = 0; in.read((char*)&lw, 1);
    std::vector<uint64_t> low = read_packed(in, -1);
    uint64_t high_len = 0; in.read((char*)&high_len, 8);
    std::vector<uint64_t> words((high_len + 63) / 64, 0);
    in.read((char*)words.data(), 8 * words.size());
    mcl::skip_mcl(in);
    mcl::skip_mcl(in);
    positions_.clear();
    uint64_t rank = 0;
    for (uint64_t p = 0; p < high_len; p++) {
      if (words[p >> 6] >> (p & 63) & 1) {
        positions_.push_back(((p - rank) << lw) | low[rank]);
        rank++;
      }
    }
  }

  uint64_t size_;
  std::vector<uint64_t> positions_;  // decoded 1-bit positions (query form)
};

template <class T = void> using sd_vector = sd_vector_impl;

inline uint64_t size_in_bytes(const sd_vector_impl& v) {
  std::ostringstream ss; return v.serialize(ss);
}

// -- sd_vector supports -------------------------------------------------------

class rank_support_sd {
 public:
  rank_support_sd(const sd_vector_impl* v = nullptr) : v_(v) {}
  void set_vector(const sd_vector_impl* v) { v_ = v; }
  void init() {}
  uint64_t operator()(uint64_t i) const {   // #1s in [0, i)
    return std::lower_bound(v_->positions_.begin(), v_->positions_.end(), i)
           - v_->positions_.begin();
  }
  uint64_t serialize(std::ostream&, structure_tree_node* = nullptr,
                     std::string = "") const { return 0; }
  void load(std::istream&, const sd_vector_impl* v = nullptr) { v_ = v; }
 private:
  const sd_vector_impl* v_;
};

class select_support_sd {
 public:
  select_support_sd(const sd_vector_impl* v = nullptr) : v_(v) {}
  void set_vector(const sd_vector_impl* v) { v_ = v; }
  void init() {}
  uint64_t operator()(uint64_t k) const {   // position of the k-th 1 (1-based)
    return v_->positions_[k - 1];
  }
  uint64_t serialize(std::ostream&, structure_tree_node* = nullptr,
                     std::string = "") const { return 0; }
  void load(std::istream&, const sd_vector_impl* v = nullptr) { v_ = v; }
 private:
  const sd_vector_impl* v_;
};

class select_0_support_sd {
 public:
  select_0_support_sd(const sd_vector_impl* v = nullptr) : v_(v) {}
  void set_vector(const sd_vector_impl* v) { v_ = v; }
  void init() {}
  uint64_t operator()(uint64_t k) const {   // position of the k-th 0 (1-based)
    // zeros(p) = p - rank1(p); binary search the smallest p with
    // zeros(p+1) == k and bit p == 0
    uint64_t lo = 0, hi = v_->size_;        // answer in [0, size)
    const std::vector<uint64_t>& pos = v_->positions_;
    while (lo < hi) {
      uint64_t mid = lo + (hi - lo) / 2;
      uint64_t ones = std::upper_bound(pos.begin(), pos.end(), mid) - pos.begin();
      uint64_t zeros = (mid + 1) - ones;    // zeros in [0, mid]
      if (zeros >= k) hi = mid; else lo = mid + 1;
    }
    return lo;
  }
  uint64_t serialize(std::ostream&, structure_tree_node* = nullptr,
                     std::string = "") const { return 0; }
  void load(std::istream&, const sd_vector_impl* v = nullptr) { v_ = v; }
 private:
  const sd_vector_impl* v_;
};

namespace util {
template <class S, class V>
void init_support(S& s, const V* v) { s.set_vector(v); s.init(); }
template <class S, class V>
void swap_support(S& a, S& b, const V* va, const V* vb) {
  std::swap(a, b); a.set_vector(va); b.set_vector(vb);
}
}  // namespace util

// -- int_vector_buffer<8> -----------------------------------------------------

// File-backed byte sequence with the int_vector<8> on-disk framing
// (u64 size-in-bits header + raw bytes padded to whole words).  Simplified:
// the whole payload lives in memory between open and close.
template <uint8_t W>
class int_vector_buffer {
 public:
  static_assert(W == 8, "minisdsl: only int_vector_buffer<8>");
  typedef uint64_t size_type;

  int_vector_buffer() {}
  explicit int_vector_buffer(const std::string& filename,
                             std::ios_base::openmode mode = std::ios::in,
                             uint64_t = 1024 * 1024, uint8_t = 8,
                             bool = false)
      : filename_(filename), dirty_(false) {
    if (mode & std::ios::out) {
      dirty_ = true;                       // fresh writable buffer
    } else {
      std::ifstream in(filename.c_str(), std::ios::binary);
      if (in) {
        uint64_t bits_n = 0;
        in.read((char*)&bits_n, 8);
        data_.resize(bits_n / 8);
        in.read((char*)data_.data(), data_.size());
      }
    }
  }
  int_vector_buffer(int_vector_buffer&& o) { *this = std::move(o); }
  int_vector_buffer& operator=(int_vector_buffer&& o) {
    flush_();
    filename_ = std::move(o.filename_);
    data_ = std::move(o.data_);
    dirty_ = o.dirty_;
    o.filename_.clear(); o.data_.clear(); o.dirty_ = false;
    return *this;
  }
  ~int_vector_buffer() { flush_(); }

  uint64_t size() const { return data_.size(); }
  bool is_open() const { return !filename_.empty(); }
  uint8_t operator[](uint64_t i) const { return data_[i]; }
  void push_back(uint8_t v) { data_.push_back(v); dirty_ = true; }
  void close(bool remove_file = false) {
    if (remove_file) { filename_.clear(); }
    flush_();
    filename_.clear(); data_.clear(); dirty_ = false;
  }

 private:
  void flush_() {
    if (dirty_ && !filename_.empty()) {
      std::ofstream out(filename_.c_str(), std::ios::binary);
      uint64_t bits_n = data_.size() * 8ULL;
      out.write((const char*)&bits_n, 8);
      out.write((const char*)data_.data(), data_.size());
      uint64_t pad = (8 - (data_.size() & 7)) & 7;
      char zeros[8] = {0};
      out.write(zeros, pad);
      dirty_ = false;
    }
  }
  std::string filename_;
  std::vector<uint8_t> data_;
  bool dirty_ = false;
};

// -- ram files (implemented as real temp files) -------------------------------

inline std::string ram_file_name(const std::string& s) {
  std::string clean;
  for (char c : s) if (isalnum((unsigned char)c)) clean += c;
  return "/tmp/minisdsl_ram_" + clean;
}

namespace ram_fs {
inline void remove(const std::string& name) { ::remove(name.c_str()); }
}

template <uint8_t W>
inline void store_to_file(const int_vector<W>& v, const std::string& file) {
  std::ofstream out(file.c_str(), std::ios::binary);
  v.serialize(out);
}

// generic size accounting: serialize into a counting null stream
template <class T>
inline uint64_t size_in_bytes(const T& t) {
  std::ostringstream ss;
  return t.serialize(ss, nullptr, "");
}

}  // namespace sdsl
