// ventjax native DICOM decoder.
//
// Host-side ingest is the reference pipeline's I/O hot spot (SURVEY.md §3.1:
// the per-slice dcmread loop in openDICOMfolder).  This library parses DICOM
// Part-10 files (Explicit/Implicit VR Little Endian, Deflated Explicit VR
// LE, retired Explicit VR Big Endian, and RLE Lossless encapsulated pixel
// data — every transfer syntax the Python codec ventjax/io/dicom.py
// handles) with zero Python overhead;
// ventjax.io.native binds it via ctypes and the cohort loader fans file
// decodes out across threads (the function releases the GIL for the whole
// parse).  Semantics mirror the Python codec (ventjax/io/dicom.py) exactly:
// PS3.5 G.3.1 PackBits segments, MSB-first byte planes per sample, one
// fragment per frame; deflated bodies are raw-deflate (PS3.5 A.5).
//
// API (stable, C ABI):
//   vj_dicom_decode(path, meta[8], spacing[3], &pixels, &nbytes) -> 0 on ok
//     meta = {rows, cols, frames, samples, bits, pixel_representation,
//             has_spacing, has_slice_spacing}
//     spacing = {row_mm, col_mm, between_slices_mm}
//     pixels = malloc'd raw little-endian pixel buffer (caller frees via
//              vj_free)
//   vj_free(ptr)
//   vj_version() -> int
//
// Build: make -C native   (g++ -O2 -shared -fPIC)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <utility>
#include <vector>

#include <zlib.h>

namespace {

struct Cursor {
  const uint8_t* buf;
  size_t len;
  size_t pos = 0;
  bool ok = true;
  bool be = false;  // Explicit VR Big Endian body (tags/lengths/US swapped)

  uint16_t u16() {
    if (pos + 2 > len) { ok = false; return 0; }
    uint16_t v;
    std::memcpy(&v, buf + pos, 2);
    pos += 2;
    return be ? __builtin_bswap16(v) : v;
  }
  uint32_t u32() {
    if (pos + 4 > len) { ok = false; return 0; }
    uint32_t v;
    std::memcpy(&v, buf + pos, 4);
    pos += 4;
    return be ? __builtin_bswap32(v) : v;
  }
  bool skip(size_t n) {
    if (pos + n > len) { ok = false; return false; }
    pos += n;
    return true;
  }
};

struct Parsed {
  int64_t rows = 0, cols = 0, frames = 1, samples = 1, bits = 16, pixrep = 0;
  double row_sp = 0, col_sp = 0, slice_sp = 0;
  bool has_spacing = false, has_slice_sp = false;
  const uint8_t* pixels = nullptr;
  size_t pixel_len = 0;
  // Encapsulated PixelData: one compressed fragment per frame (PS3.5 A.4).
  std::vector<std::pair<const uint8_t*, size_t>> fragments;
  std::vector<uint8_t> decoded;   // RLE output; pixels points here
  std::vector<uint8_t> inflated;  // deflated-body storage (owns the walk)
};

bool is_short_vr(const char vr[2]) {
  static const char* long_vrs[] = {"OB", "OW", "OF", "OD", "OL",
                                   "SQ", "UC", "UR", "UT", "UN"};
  for (auto* lv : long_vrs)
    if (vr[0] == lv[0] && vr[1] == lv[1]) return false;
  return true;
}

double parse_ds(const uint8_t* p, size_t n) {
  std::string s(reinterpret_cast<const char*>(p), n);
  return atof(s.c_str());
}

uint16_t rd_us(const uint8_t* p, bool be) {
  uint16_t v;
  std::memcpy(&v, p, 2);
  return be ? __builtin_bswap16(v) : v;
}

// Walk one dataset level.  `end` bounds the walk; sequences with undefined
// length recurse until their delimiter.  Returns false on malformed data.
bool walk(Cursor& c, size_t end, bool explicit_vr, Parsed& out, int depth) {
  if (depth > 16) return false;
  while (c.pos + 8 <= end && c.ok) {
    uint16_t group = c.u16();
    uint16_t elem = c.u16();
    // delimiters
    if (group == 0xFFFE) {
      uint32_t len = c.u32();
      if (elem == 0xE00D || elem == 0xE0DD) return true;  // end of item/seq
      // item start: recurse one level (same tag capture)
      size_t iend = (len == 0xFFFFFFFF) ? end : c.pos + len;
      if (!walk(c, iend, explicit_vr, out, depth + 1)) return false;
      continue;
    }
    char vr[2] = {0, 0};
    uint32_t len;
    if (explicit_vr) {
      if (c.pos + 2 > c.len) return false;
      vr[0] = c.buf[c.pos];
      vr[1] = c.buf[c.pos + 1];
      c.pos += 2;
      if (is_short_vr(vr)) {
        len = c.u16();
      } else {
        c.skip(2);
        len = c.u32();
      }
    } else {
      len = c.u32();
    }
    if (!c.ok) return false;

    uint32_t tag0 = (uint32_t(group) << 16) | elem;
    if (tag0 == 0x7FE00010 && len == 0xFFFFFFFF) {
      // Encapsulated PixelData: Basic Offset Table item then one fragment
      // item per frame, closed by a sequence delimiter.
      bool first = true;
      while (c.ok) {
        uint16_t g2 = c.u16();
        uint16_t e2 = c.u16();
        uint32_t l2 = c.u32();
        if (!c.ok) return false;
        if (g2 == 0xFFFE && e2 == 0xE0DD) break;
        if (g2 != 0xFFFE || e2 != 0xE000 || l2 == 0xFFFFFFFF) return false;
        if (c.pos + l2 > c.len) return false;
        if (first) {
          first = false;  // offset table, unused
        } else {
          out.fragments.emplace_back(c.buf + c.pos, size_t(l2));
        }
        c.pos += l2;
      }
      continue;
    }

    bool is_sq = explicit_vr ? (vr[0] == 'S' && vr[1] == 'Q')
                             : (len == 0xFFFFFFFF);
    if (is_sq || len == 0xFFFFFFFF) {
      size_t send = (len == 0xFFFFFFFF) ? end : c.pos + len;
      if (!walk(c, send, explicit_vr, out, depth + 1)) return false;
      continue;
    }

    uint32_t tag = (uint32_t(group) << 16) | elem;
    const uint8_t* val = c.buf + c.pos;
    if (c.pos + len > c.len) return false;  // value bytes must be in-buffer
    bool us_ok = len >= 2;                  // US reads need 2 value bytes
    switch (tag) {
      case 0x00280010: if (us_ok) out.rows = rd_us(val, c.be); break;
      case 0x00280011: if (us_ok) out.cols = rd_us(val, c.be); break;
      case 0x00280002: if (us_ok) out.samples = rd_us(val, c.be); break;
      case 0x00280100: if (us_ok) out.bits = rd_us(val, c.be); break;
      case 0x00280103: if (us_ok) out.pixrep = rd_us(val, c.be); break;
      case 0x00280008: {  // NumberOfFrames, IS string
        std::string s(reinterpret_cast<const char*>(val), len);
        out.frames = atoll(s.c_str());
        if (out.frames <= 0) out.frames = 1;
        break;
      }
      case 0x00280030: {  // PixelSpacing "row\col"
        if (!out.has_spacing) {
          std::string s(reinterpret_cast<const char*>(val), len);
          size_t sep = s.find('\\');
          if (sep != std::string::npos) {
            out.row_sp = atof(s.substr(0, sep).c_str());
            out.col_sp = atof(s.substr(sep + 1).c_str());
            out.has_spacing = true;
          }
        }
        break;
      }
      case 0x00180088:
        out.slice_sp = parse_ds(val, len);
        out.has_slice_sp = true;
        break;
      case 0x7FE00010:
        out.pixels = val;
        out.pixel_len = len;
        break;
      default:
        break;
    }
    if (!c.skip(len)) return false;
  }
  return true;
}

// PS3.5 G.3.1 PackBits segment decode — Python parity (_rle_decode_segment):
// 0..127 copy n+1 literals, 129..255 repeat next byte 257-n times, 128 pad.
bool packbits(const uint8_t* d, size_t n, uint8_t* dst, size_t expected) {
  size_t i = 0, o = 0;
  while (i < n && o < expected) {
    uint8_t h = d[i++];
    if (h < 128) {
      size_t cnt = size_t(h) + 1;
      if (i + cnt > n) return false;  // literal run past end
      if (cnt > expected - o) cnt = expected - o;
      std::memcpy(dst + o, d + i, cnt);
      i += size_t(h) + 1;
      o += cnt;
    } else if (h > 128) {
      if (i >= n) return false;  // replicate run past end
      size_t cnt = 257 - size_t(h);
      if (cnt > expected - o) cnt = expected - o;
      std::memset(dst + o, d[i], cnt);
      i += 1;
      o += cnt;
    }
    // h == 128: no-op padding
  }
  return o == expected;
}

// Decode all RLE fragments into p.decoded as native little-endian,
// sample-interleaved pixels — Python parity (_rle_decode_frame: byte
// planes MSB-first within each sample, one fragment per frame).
bool decode_rle(Parsed& p) {
  int64_t bpp = p.bits / 8;
  if (bpp < 1 || bpp > 4 || p.rows <= 0 || p.cols <= 0 || p.samples <= 0)
    return false;
  if (int64_t(p.fragments.size()) != p.frames) return false;
  size_t npix = size_t(p.rows) * size_t(p.cols);
  size_t nseg = size_t(p.samples) * size_t(bpp);
  if (nseg > 15) return false;
  size_t frame_bytes = npix * nseg;
  p.decoded.resize(size_t(p.frames) * frame_bytes);
  std::vector<uint8_t> planes(nseg * npix);
  for (size_t fi = 0; fi < p.fragments.size(); ++fi) {
    const uint8_t* frag = p.fragments[fi].first;
    size_t flen = p.fragments[fi].second;
    if (flen < 64) return false;
    uint32_t hdr[16];
    std::memcpy(hdr, frag, 64);
    if (hdr[0] != nseg) return false;
    for (size_t k = 0; k < nseg; ++k) {
      uint32_t off = hdr[1 + k];
      if (off < 64 || off > flen) return false;
      if (k + 1 < nseg && hdr[2 + k] < off) return false;
      size_t end = (k + 1 < nseg) ? hdr[2 + k] : flen;
      if (end > flen) return false;
      if (!packbits(frag + off, end - off, planes.data() + k * npix, npix))
        return false;
    }
    uint8_t* dst = p.decoded.data() + fi * frame_bytes;
    for (size_t px = 0; px < npix; ++px)
      for (int64_t s = 0; s < p.samples; ++s)
        for (int64_t b = 0; b < bpp; ++b)  // b: byte plane, MSB first
          dst[(px * size_t(p.samples) + size_t(s)) * size_t(bpp) +
              size_t(bpp - 1 - b)] = planes[(size_t(s) * bpp + b) * npix + px];
  }
  p.pixels = p.decoded.data();
  p.pixel_len = p.decoded.size();
  return true;
}

// Raw-deflate (no zlib header) inflate of the post-meta body (PS3.5 A.5).
bool inflate_raw(const uint8_t* src, size_t n, std::vector<uint8_t>& dst) {
  z_stream zs;
  std::memset(&zs, 0, sizeof zs);
  if (inflateInit2(&zs, -15) != Z_OK) return false;
  zs.next_in = const_cast<Bytef*>(src);
  zs.avail_in = uInt(n);
  dst.clear();
  std::vector<uint8_t> chunk(1 << 16);
  int ret = Z_OK;
  while (ret != Z_STREAM_END) {
    zs.next_out = chunk.data();
    zs.avail_out = uInt(chunk.size());
    ret = inflate(&zs, Z_NO_FLUSH);
    if (ret != Z_OK && ret != Z_STREAM_END) {
      inflateEnd(&zs);
      return false;
    }
    dst.insert(dst.end(), chunk.data(),
               chunk.data() + (chunk.size() - zs.avail_out));
    if (ret == Z_OK && zs.avail_in == 0 && zs.avail_out != 0) break;
  }
  inflateEnd(&zs);
  return ret == Z_STREAM_END;
}

// Byte-swap big-endian pixel words into native little-endian storage
// (Python parity: dicom.py pixel_array views BE files with a ">" dtype and
// the binding re-orders to native; here the output contract is always LE).
bool swap_pixels_be(Parsed& p) {
  size_t word = size_t(p.bits) / 8;
  if (word == 0 || p.pixel_len % word != 0) return false;
  if (word == 1) return true;  // 8-bit: nothing to swap
  p.decoded.resize(p.pixel_len);
  const uint8_t* src = p.pixels;
  for (size_t i = 0; i < p.pixel_len; i += word)
    for (size_t b = 0; b < word; ++b)
      p.decoded[i + b] = src[i + word - 1 - b];
  p.pixels = p.decoded.data();
  return true;
}

bool parse_file(const uint8_t* buf, size_t n, Parsed& out) {
  size_t body_start = 0;
  bool explicit_vr = true;
  bool rle = false;
  bool big_endian = false;
  if (n > 132 && std::memcmp(buf + 128, "DICM", 4) == 0) {
    // file meta group (always explicit); find transfer syntax (0002,0010).
    // (0002,0000) FileMetaInformationGroupLength, when present, bounds the
    // meta group exactly — essential for Deflated files, where the body is
    // a raw deflate stream whose first bytes may parse as a 0002 tag.
    Cursor m{buf, n, 132};
    std::string ts;
    size_t meta_end = 0;  // 0 = unknown
    while (m.pos + 8 <= n && m.ok) {
      if (meta_end && m.pos >= meta_end) break;
      size_t save = m.pos;
      uint16_t group = m.u16();
      uint16_t elem = m.u16();
      if (group != 0x0002) { m.pos = save; break; }
      char vr[2] = {(char)buf[m.pos], (char)buf[m.pos + 1]};
      m.pos += 2;
      uint32_t len;
      if (is_short_vr(vr)) len = m.u16();
      else { m.skip(2); len = m.u32(); }
      if (!m.ok || m.pos + len > n) return false;  // malformed meta group
      if (elem == 0x0010)
        ts.assign(reinterpret_cast<const char*>(buf + m.pos), len);
      if (elem == 0x0000 && len == 4 && !meta_end) {
        uint32_t gl;
        std::memcpy(&gl, buf + m.pos, 4);
        size_t end = m.pos + 4 + size_t(gl);
        if (end >= m.pos + 4 && end <= n) meta_end = end;
      }
      m.skip(len);
    }
    if (meta_end && m.pos < meta_end) m.pos = meta_end;
    body_start = m.pos;
    while (!ts.empty() && (ts.back() == '\0' || ts.back() == ' ')) ts.pop_back();
    if (ts == "1.2.840.10008.1.2") {
      explicit_vr = false;
    } else if (ts == "1.2.840.10008.1.2.5") {
      rle = true;  // RLE Lossless: Explicit VR LE + encapsulated pixels
    } else if (ts == "1.2.840.10008.1.2.2") {
      big_endian = true;  // retired Explicit VR Big Endian
    } else if (ts == "1.2.840.10008.1.2.1.99") {
      if (!inflate_raw(buf + body_start, n - body_start, out.inflated))
        return false;
      Cursor c{out.inflated.data(), out.inflated.size(), 0};
      return walk(c, out.inflated.size(), true, out, 0) && out.rows > 0 &&
             out.pixels;
    } else if (!ts.empty() && ts != "1.2.840.10008.1.2.1") {
      return false;
    }
  }
  Cursor c{buf, n, body_start};
  c.be = big_endian;
  if (!walk(c, n, explicit_vr, out, 0) || out.rows <= 0) return false;
  if (rle) return decode_rle(out);
  if (!out.pixels) return false;
  if (big_endian) return swap_pixels_be(out);
  return true;
}

}  // namespace

extern "C" {

int vj_version() { return 3; }

void vj_free(uint8_t* p) { std::free(p); }

int vj_dicom_decode(const char* path, int64_t meta[8], double spacing[3],
                    uint8_t** pixels, int64_t* nbytes) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(n);
  if (std::fread(buf.data(), 1, n, f) != size_t(n)) {
    std::fclose(f);
    return 2;
  }
  std::fclose(f);

  Parsed p;
  if (!parse_file(buf.data(), buf.size(), p)) return 3;

  meta[0] = p.rows;
  meta[1] = p.cols;
  meta[2] = p.frames;
  meta[3] = p.samples;
  meta[4] = p.bits;
  meta[5] = p.pixrep;
  meta[6] = p.has_spacing ? 1 : 0;
  meta[7] = p.has_slice_sp ? 1 : 0;
  spacing[0] = p.row_sp;
  spacing[1] = p.col_sp;
  spacing[2] = p.slice_sp;

  uint8_t* out = static_cast<uint8_t*>(std::malloc(p.pixel_len));
  if (!out) return 4;
  std::memcpy(out, p.pixels, p.pixel_len);
  *pixels = out;
  *nbytes = int64_t(p.pixel_len);
  return 0;
}

}  // extern "C"
