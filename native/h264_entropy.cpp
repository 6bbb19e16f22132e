// TPU-native H.264 host entropy engine: full CAVLC + CABAC slice_data()
// decoding (spec 7.3.4/7.3.5/9.2/9.3) into the FrameTensors SoA buffers.
//
// This is the C++ twin of h264decode_tpu/entropy/{cavlc_slice,cabac_slice,
// mv_pred,direct,slice_base}.py — same algorithms, same table provenance
// (tables.h is generated from the same spec-exact Python tables), validated
// bit-exactly against the Python reference by the test suite. It exists
// because the sequential entropy stage is the host-side bottleneck of the
// decoder (SURVEY.md section 7.3): CABAC/CAVLC cannot be parallelized within
// a slice, so the engine must simply be fast.
//
// Build: make -C native   ->  libh264entropy.so (ctypes, see entropy/native.py)

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <cstdio>

#include "tables.h"

extern "C" {

// ---------------------------------------------------------------------------
// Bit reader (64-bit cached)
// ---------------------------------------------------------------------------

struct BitReader {
  const uint8_t* data;
  int64_t nbits;
  int64_t pos;
  int64_t stop_bit;  // position of rbsp_stop_one_bit
};

static void br_init(BitReader* r, const uint8_t* data, int64_t nbytes,
                    int64_t start_bit) {
  r->data = data;
  r->nbits = nbytes * 8;
  r->pos = start_bit;
  int64_t i = nbytes - 1;
  while (i >= 0 && data[i] == 0) i--;
  if (i < 0) {
    r->stop_bit = 0;
  } else {
    uint8_t b = data[i];
    int low = __builtin_ctz(b);
    r->stop_bit = i * 8 + (7 - low);
  }
}

static inline uint32_t br_u(BitReader* r, int n) {
  if (n == 0) return 0;
  int64_t pos = r->pos;
  r->pos = pos + n;
  // read up to 32 bits MSB-first
  int64_t byte0 = pos >> 3;
  uint64_t chunk = 0;
  for (int i = 0; i < 8; i++) {
    int64_t bi = byte0 + i;
    chunk = (chunk << 8) | (bi * 8 < r->nbits ? r->data[bi] : 0);
  }
  int shift = 64 - (int)(pos - byte0 * 8) - n;
  return (uint32_t)((chunk >> shift) & ((n == 32) ? 0xffffffffu : ((1u << n) - 1)));
}

static inline uint32_t br_peek16(BitReader* r) {
  int64_t pos = r->pos;
  int64_t byte0 = pos >> 3;
  uint32_t chunk = 0;
  for (int i = 0; i < 4; i++) {
    int64_t bi = byte0 + i;
    chunk = (chunk << 8) | (bi * 8 < r->nbits ? r->data[bi] : 0);
  }
  return (chunk >> (32 - (int)(pos - byte0 * 8) - 16)) & 0xffff;
}

static inline uint32_t br_ue(BitReader* r) {
  // count leading zeros via a 32-bit window
  int lz = 0;
  while (true) {
    uint32_t w = br_peek16(r);
    if (w == 0) {
      r->pos += 16;
      lz += 16;
      if (lz > 40) return 0;  // corrupt
      continue;
    }
    int l = __builtin_clz(w) - 16;
    lz += l;
    r->pos += l + 1;  // zeros + the marker 1
    break;
  }
  if (lz == 0) return 0;
  return (1u << lz) - 1 + br_u(r, lz);
}

static inline int32_t br_se(BitReader* r) {
  uint32_t k = br_ue(r);
  return (k & 1) ? (int32_t)((k + 1) >> 1) : -(int32_t)(k >> 1);
}

static inline uint32_t br_te(BitReader* r, int maxv) {
  if (maxv == 1) return 1 - br_u(r, 1);
  return br_ue(r);
}

static inline void br_align(BitReader* r) { r->pos = (r->pos + 7) & ~7LL; }

static inline bool br_more_rbsp(BitReader* r) { return r->pos < r->stop_bit; }

static inline int read_vlc(BitReader* r, const VlcEntry* tab, int n) {
  uint32_t w = br_peek16(r);
  for (int i = 0; i < n; i++) {
    int len = tab[i].len;
    if ((w >> (16 - len)) == tab[i].bits) {
      r->pos += len;
      return tab[i].value;
    }
  }
  return -1;  // corrupt stream
}

// ---------------------------------------------------------------------------
// CABAC engine (spec 9.3.3.2)
// ---------------------------------------------------------------------------

struct Cabac {
  BitReader* r;
  int32_t range, offset;
  uint8_t state[1024];
  uint8_t mps[1024];
};

static inline int clip3(int lo, int hi, int v) {
  return v < lo ? lo : (v > hi ? hi : v);
}

static void cabac_init(Cabac* c, BitReader* r, int qp, int intra_slice,
                       int init_idc) {
  while (r->pos & 7) br_u(r, 1);  // cabac_alignment_one_bit
  c->r = r;
  c->range = 510;
  c->offset = br_u(r, 9);
  const int(*tab)[2] = intra_slice  ? kCtxInitI
                       : init_idc == 0 ? kCtxInitPB0
                       : init_idc == 1 ? kCtxInitPB1
                                       : kCtxInitPB2;
  int q = clip3(0, 51, qp);
  for (int i = 0; i < 1024; i++) {
    int pre = clip3(1, 126, ((tab[i][0] * q) >> 4) + tab[i][1]);
    if (pre <= 63) {
      c->state[i] = 63 - pre;
      c->mps[i] = 0;
    } else {
      c->state[i] = pre - 64;
      c->mps[i] = 1;
    }
  }
}

static inline int cb_bit(Cabac* c) {
  BitReader* r = c->r;
  if (r->pos < r->nbits) return br_u(r, 1);
  r->pos++;
  return 0;
}

static inline int cb_dec(Cabac* c, int ctx) {
  int st = c->state[ctx];
  int rng = c->range;
  int lps = kRangeLPS[st][(rng >> 6) & 3];
  rng -= lps;
  int off = c->offset;
  int bin;
  if (off >= rng) {
    off -= rng;
    rng = lps;
    bin = 1 - c->mps[ctx];
    if (st == 0) c->mps[ctx] ^= 1;
    c->state[ctx] = kTransLPS[st];
  } else {
    bin = c->mps[ctx];
    c->state[ctx] = kTransMPS[st];
  }
  while (rng < 256) {
    rng <<= 1;
    off = (off << 1) | cb_bit(c);
  }
  c->range = rng;
  c->offset = off;
  return bin;
}

static inline int cb_bypass(Cabac* c) {
  int off = (c->offset << 1) | cb_bit(c);
  if (off >= c->range) {
    c->offset = off - c->range;
    return 1;
  }
  c->offset = off;
  return 0;
}

#ifdef H264_DEBUG_TRACE
#include <cstdio>
#endif

static inline int cb_term(Cabac* c) {
  c->range -= 2;
  if (c->offset >= c->range) {
#ifdef H264_DEBUG_TRACE
    fprintf(stderr, "C term -> 1 range=%d offset=%d\n", c->range, c->offset);
#endif
    return 1;
  }
  while (c->range < 256) {
    c->range <<= 1;
    c->offset = (c->offset << 1) | cb_bit(c);
  }
#ifdef H264_DEBUG_TRACE
  fprintf(stderr, "C term -> 0 range=%d offset=%d\n", c->range, c->offset);
#endif
  return 0;
}

static inline void cb_flush(Cabac* c) {
  c->range = 2;
  while (c->range < 256) {
    c->range <<= 1;
    c->offset = (c->offset << 1) | cb_bit(c);
  }
}

static inline void cb_reinit(Cabac* c) {
  c->range = 510;
  c->offset = br_u(c->r, 9);
#ifdef H264_DEBUG_TRACE
  fprintf(stderr, "C reinit pos=%lld range=%d offset=%d\n",
          (long long)c->r->pos, c->range, c->offset);
#endif
}

static inline int cb_ueg_suffix(Cabac* c, int k) {
  int v = 0;
  while (cb_bypass(c)) {
    v += 1 << k;
    k++;
    if (k > 30) break;
  }
  while (k > 0) {
    k--;
    v += cb_bypass(c) << k;
  }
  return v;
}

// ---------------------------------------------------------------------------
// Parameter / buffer structs (ctypes mirror: entropy/native.py)
// ---------------------------------------------------------------------------

struct SliceParams {
  int32_t cabac;          // entropy_coding_mode
  int32_t slice_type;     // 0 P, 1 B, 2 I (mod-5 already applied; SP->P, SI->I)
  int32_t slice_qp;
  int32_t cabac_init_idc;
  int32_t first_mb;
  int32_t mb_w, mb_h;
  int32_t n_ref0, n_ref1;
  int32_t transform8x8_mode;
  int32_t constrained_intra;
  int32_t chroma_format;   // ChromaArrayType 0..3
  int32_t direct_8x8_inference;
  int32_t spatial_direct;
  int32_t disable_deblock;
  int32_t alpha_off, beta_off;
  int32_t slice_id;
  int32_t cur_poc;
  int32_t col_short_term;
  int32_t col_poc;
  int32_t n_col;          // 1 if colocated grids provided
  int32_t field_pic;      // PAFF field picture: CABAC field ctx columns
  int32_t sp_slice;       // SP or SI slice: mark sp_slice_mb (deblock bS)
  int32_t is_si;          // SI slice (CAVLC Table 7-12 mb_type semantics)
  int32_t mbaff;          // MBAFF frame: pair walk + 6.4.10 neighbors
  int32_t col_top_poc;    // colocated picture field POCs (8.4.1.2.1 AFRM)
  int32_t col_bottom_poc;
  int32_t has_mb_next;    // FMO: mb_next holds the 8.2.2.8 next-address LUT
  int32_t has_dp;         // data-partitioned slice (B/C pointers may be null)
  int32_t bit_depth_luma;   // 8..14 (High 10: QP wrap + PCM width)
  int32_t bit_depth_chroma;
  const int32_t* ref_uids0;  // [n_ref0]
  const int32_t* ref_uids1;
  const int32_t* l0_pocs;
  const uint8_t* l0_lt;
  const int32_t* col_mv;      // [H4*W4*2]
  const int8_t* col_ref_idx;  // [H4*W4]
  const int32_t* col_ref_uid; // [H4*W4]
  const uint8_t* col_mb_field;  // [n] colocated picture per-MB field flags
  const int32_t* mb_next;       // [n] next decode address (FMO slice groups)
  // data partitioning (7.4.1, CAVLC-only): category-3/4 residual elements
  // read from the B/C partition bitstreams (null = partition absent;
  // referencing an absent partition fails the slice, matching the Python
  // engine's deferred raise)
  const uint8_t* part_b;
  int64_t part_b_len;
  int64_t part_b_bit;
  const uint8_t* part_c;
  int64_t part_c_len;
  int64_t part_c_bit;
  // MBAFF-field temporal direct (8.4.1.2.3 field variant, direct.py):
  // colocated referenced-field parities, list-0 FIELD order counts per
  // frame position, and the current picture's field POCs
  const int8_t* col_ref_parity;  // [H4*W4] or null
  const int32_t* l0_top_pocs;    // [n_l0_field] or null
  const int32_t* l0_bottom_pocs;
  int32_t n_l0_field;
  int32_t cur_top_poc;
  int32_t cur_bottom_poc;
};

struct FrameBuffers {
  int8_t* mb_class;
  uint8_t* transform8x8;
  int8_t* qp;
  uint8_t* cbp;
  int8_t* intra4x4_modes;  // [n][16]
  int8_t* intra16_mode;
  int8_t* chroma_mode;
  int16_t* luma_ac;   // [n][16][16]
  int16_t* luma_dc;   // [n][16]
  int16_t* luma8_ac;  // [n][4][64]
  int16_t* chroma_dc; // [n][2][4]
  int16_t* chroma_ac; // [n][2][4][16]
  int16_t* mv;        // [n][2][16][2]
  int8_t* ref_idx;    // [n][2][4]
  uint8_t* pred_flags;// [n][2][4]
  int32_t* ref_pic;   // [n][2][4]
  int32_t* slice_id;
  int8_t* disable_deblock;
  int8_t* alpha_off;
  int8_t* beta_off;
  int8_t* cbf_dc;     // [n][3]
  int8_t* luma_nnz;   // [H4][W4]
  int8_t* chroma_nnz; // [2][H2][W2]
  // motion grids
  int32_t* g_mv;      // [2][H4][W4][2]
  int8_t* g_ref;      // [2][H4][W4]
  int8_t* g_refctx;   // [2][H4][W4]
  int32_t* g_absmvd;  // [2][H4][W4][2]
  int8_t* mode_grid;  // [H4][W4]
  int32_t* decode_order;  // [n]
  int32_t* n_decoded;     // scalar out
  uint8_t* pcm_y;     // [mb_h*16][mb_w*16]
  uint8_t* pcm_cb;    // [mb_h*ch_mb_h][mb_w*ch_w]
  uint8_t* pcm_cr;
  uint8_t* sp_slice_mb;  // [n] bool
  // ChromaArrayType 3: per-component luma-geometry chroma residuals
  int16_t* c444_dc;   // [n][2][16]
  int16_t* c444_ac;   // [n][2][16][16]
  int16_t* c444_8x8;  // [n][2][4][64]
  int8_t* c444_nnz;   // [2][H4][W4]
  uint8_t* mb_field;  // [n] bool (MBAFF per-MB field flag)
  int8_t* ref_parity; // [n][2][4] referenced field parity (-1 = frame)
};

// MB classes (tensors/frame_tensors.py)
enum { MB_I_NXN = 0, MB_I_16X16 = 1, MB_I_PCM = 2, MB_P = 3, MB_P_SKIP = 4,
       MB_B = 5, MB_B_SKIP = 6, MB_B_DIRECT = 7, MB_SI = 8 };
enum { UNAVAIL = -2, NO_LIST = -1 };

struct Ctx {
  const SliceParams* p;
  FrameBuffers* f;
  BitReader r;
  Cabac c;
  int mb_w, mb_h, n, H4, W4, H2, W2;
  // chroma geometry by format: 4x4-block rows per MB (2 / 4 at 4:2:2),
  // DC coeff count (4 / 8), AC block count (4 / 8), PCM sample extents
  int cf, ch_rows, ch_dc_n, ch_blks, ch_mb_h, ch_w;
  int field_pic;
  // MBAFF walk state: the current MB (spatial addr + field flag + top-left
  // cell), and the pair whose mb_field_decoding_flag is not yet decoded
  // (mb_skip_flag precedes it; neighbor derivation uses 7.4.4 inference)
  int mbaff, cur_addr, cur_field, cur_cx0, cur_cy0;
  int cur_pair_top_unknown;  // spatial addr of that pair's top MB, or -1
  int any_field;             // any field pair decoded so far (this frame)
  // data partitioning: residual readers (aliases of &r without DP)
  BitReader rB, rC;
  BitReader* res_intra;
  BitReader* res_inter;
  BitReader* res;  // active residual reader for the current MB
  int missing_part;  // a residual read hit an absent B/C partition
  int qp_bd_offset;  // 6 * (BitDepthY - 8): spec 7-37 QP wrap range
  int qp_prev;
  int last_qp_delta;
  int is_cabac;
  // direct-predicted 4x4 cells (B_Skip / B_Direct_16x16 / B_Direct_8x8
  // sub-partitions) — excluded from the CABAC ref_idx ctx (9.3.3.1.1.6)
  uint8_t* g_direct;  // [H4][W4], slice-lifetime scratch
};

// ---------------------------------------------------------------------------
// Shared helpers (slice_base.py)
// ---------------------------------------------------------------------------

static inline bool mb_avail(Ctx* t, int naddr) {
  return naddr >= 0 && naddr < t->n && t->f->slice_id[naddr] == t->p->slice_id;
}

// ---------------------------------------------------------------------------
// MBAFF: 6.4.10 neighbouring-location derivation + pair helpers
// (C++ twin of syntax/mbaff_nbr.py MbaffGrid and slice_base.py pair logic)
// ---------------------------------------------------------------------------

static inline int infer_pair_field(Ctx* t, int top_sp) {
  // 7.4.4: flag of a fully-skipped pair = left pair's, else above pair's
  int mb_w = t->mb_w;
  int mby = top_sp / mb_w, mbx = top_sp % mb_w;
  if (mbx > 0 && mb_avail(t, top_sp - 1)) return t->f->mb_field[top_sp - 1];
  if (mby >= 2 && mb_avail(t, top_sp - 2 * mb_w))
    return t->f->mb_field[top_sp - 2 * mb_w];
  return 0;
}

static inline int nbr_field_at(Ctx* t, int sp) {
  // mb_field for 6.4.10 with the 7.4.4 inference while the current pair's
  // flag is still undecoded (mb_skip_flag precedes it)
  int pair_top = ((sp / t->mb_w) & 1) ? sp - t->mb_w : sp;
  if (t->cur_pair_top_unknown == pair_top) return infer_pair_field(t, pair_top);
  return t->f->mb_field[sp];
}

static inline void set_pair_field(Ctx* t, int top_sp, int flag) {
  t->f->mb_field[top_sp] = (uint8_t)flag;
  t->f->mb_field[top_sp + t->mb_w] = (uint8_t)flag;
  if (flag) t->any_field = 1;
}

static inline int pair_avail(Ctx* t, int pr, int pc) {
  if (pr < 0 || pc < 0 || pc >= t->mb_w || 2 * pr >= t->mb_h) return 0;
  return mb_avail(t, (2 * pr) * t->mb_w + pc);
}

// (sp, xN, yN) -> neighbor spatial MB + within-MB (xW, yW); -1 when
// unavailable. maxW/maxH are 16 luma, 8 x MbHeightC chroma.
static int mbaff_neighbor(Ctx* t, int sp, int xN, int yN, int chroma,
                          int* nb, int* xW, int* yW) {
  int maxW = chroma ? 8 : 16;
  int maxH = chroma ? t->ch_mb_h : 16;
  int mb_w = t->mb_w;
  int row = sp / mb_w;
  int pr = row / 2, pc = sp % mb_w;
  int is_bottom = row & 1;
  int cur_field = nbr_field_at(t, sp);
  *nb = -1; *xW = 0; *yW = 0;

  if (xN >= 0 && xN < maxW && yN >= 0 && yN < maxH) {
    *nb = sp; *xW = xN; *yW = yN; return 0;
  }
  if (xN >= 2 * maxW || xN < -maxW || yN >= maxH) return 0;
  if (xN >= maxW && yN >= 0) return 0;
  if (xN >= maxW) {
    // C position (above-right, yN < 0)
    int xw = xN - maxW;
    if (!cur_field && is_bottom) {
      if (!pair_avail(t, pr, pc + 1)) return 0;
      int rtop = (2 * pr) * mb_w + pc + 1;
      if (!nbr_field_at(t, rtop)) { *nb = rtop; *xW = xw; *yW = maxH + yN; return 0; }
      *nb = rtop + mb_w; *xW = xw; *yW = (2 * maxH + yN) >> 1; return 0;
    }
    if (cur_field && is_bottom) {
      if (!pair_avail(t, pr - 1, pc + 1)) return 0;
      int ctop = (2 * (pr - 1)) * mb_w + pc + 1;
      if (nbr_field_at(t, ctop)) { *nb = ctop + mb_w; *xW = xw; *yW = maxH + yN; return 0; }
      *nb = ctop + mb_w; *xW = xw; *yW = maxH + 2 * yN + 1; return 0;
    }
    if (!pair_avail(t, pr - 1, pc + 1)) return 0;
    int ctop = (2 * (pr - 1)) * mb_w + pc + 1;
    int nf = nbr_field_at(t, ctop);
    if (!cur_field) { *nb = ctop + mb_w; *xW = xw; *yW = maxH + yN; return 0; }
    if (nf) { *nb = ctop; *xW = xw; *yW = maxH + yN; return 0; }
    *nb = ctop + mb_w; *xW = xw; *yW = maxH + 2 * yN; return 0;
  }
  if (yN >= 0) {
    // left neighbor (xN < 0): same absolute sample row in the left pair
    if (pc == 0 || !pair_avail(t, pr, pc - 1)) return 0;
    int ltop = (2 * pr) * mb_w + pc - 1;
    int nf = nbr_field_at(t, ltop);
    int xw = xN + maxW;
    if (cur_field == nf) { *nb = ltop + mb_w * is_bottom; *xW = xw; *yW = yN; return 0; }
    if (cur_field) {  // field MB, frame left pair
      int abs_row = 2 * yN + is_bottom;
      *nb = ltop + mb_w * (abs_row >= maxH); *xW = xw; *yW = abs_row % maxH;
      return 0;
    }
    int abs_row = maxH * is_bottom + yN;  // frame MB, field left pair
    *nb = ltop + mb_w * (abs_row & 1); *xW = xw; *yW = abs_row >> 1;
    return 0;
  }
  if (xN < 0) {
    // D position (-1, yN<0): above-left
    if (!cur_field && is_bottom) {
      if (pc == 0 || !pair_avail(t, pr, pc - 1)) return 0;
      int ltop = (2 * pr) * mb_w + pc - 1;
      int nf = nbr_field_at(t, ltop);
      if (!nf) { *nb = ltop; *xW = xN + maxW; *yW = maxH + yN; return 0; }
      *nb = ltop + mb_w; *xW = xN + maxW; *yW = (maxH + yN) >> 1; return 0;
    }
    if (cur_field && is_bottom) {
      if (pc == 0 || !pair_avail(t, pr - 1, pc - 1)) return 0;
      int dtop = (2 * (pr - 1)) * mb_w + pc - 1;
      if (nbr_field_at(t, dtop)) { *nb = dtop + mb_w; *xW = xN + maxW; *yW = maxH + yN; return 0; }
      *nb = dtop + mb_w; *xW = xN + maxW; *yW = maxH + 2 * yN + 1; return 0;
    }
    if (pc == 0 || !pair_avail(t, pr - 1, pc - 1)) return 0;
    int dtop = (2 * (pr - 1)) * mb_w + pc - 1;
    int nf = nbr_field_at(t, dtop);
    if (!cur_field) { *nb = dtop + mb_w; *xW = xN + maxW; *yW = maxH + yN; return 0; }
    if (nf) { *nb = dtop; *xW = xN + maxW; *yW = maxH + yN; return 0; }
    *nb = dtop + mb_w; *xW = xN + maxW; *yW = maxH + 2 * yN; return 0;
  }
  // above neighbor proper (0 <= xN < maxW, yN < 0)
  if (!cur_field) {
    if (is_bottom) { *nb = sp - mb_w; *xW = xN; *yW = maxH + yN; return 0; }
    if (!pair_avail(t, pr - 1, pc)) return 0;
    int btop = (2 * (pr - 1)) * mb_w + pc;
    *nb = btop + mb_w; *xW = xN; *yW = maxH + yN; return 0;
  }
  if (!pair_avail(t, pr - 1, pc)) return 0;
  int btop = (2 * (pr - 1)) * mb_w + pc;
  int nf = nbr_field_at(t, btop);
  if (nf) { *nb = btop + mb_w * is_bottom; *xW = xN; *yW = maxH + yN; return 0; }
  if (is_bottom) { *nb = btop + mb_w; *xW = xN; *yW = maxH + 2 * yN + 1; return 0; }
  *nb = btop + mb_w; *xW = xN; *yW = maxH + 2 * yN; return 0;
}

static inline int mbaff_spatial(Ctx* t, int addr_m) {
  // MBAFF decode address -> spatial raster MB address (slice_base.py)
  int pair = addr_m >> 1, bottom = addr_m & 1;
  int pr = pair / t->mb_w, pc = pair % t->mb_w;
  return (2 * pr + bottom) * t->mb_w + pc;
}

static inline void begin_mb(Ctx* t, int addr) {
  // current-MB state for the MBAFF neighbor/motion derivations
  if (!t->mbaff) return;
  t->cur_addr = addr;
  t->cur_field = t->f->mb_field[addr];
  t->cur_cx0 = (addr % t->mb_w) * 4;
  t->cur_cy0 = (addr / t->mb_w) * 4;
}

// MBAFF: (cx, cy) spatial-local cell relative to the current MB ->
// (naddr, gcx, gcy) of the neighboring cell; -1 when unavailable
static inline int resolve_cell(Ctx* t, int cx, int cy,
                               int* naddr, int* gcx, int* gcy) {
  int px = (cx - t->cur_cx0) * 4;
  int py = (cy - t->cur_cy0) * 4;
  if (px < 0) px += 3;
  if (py < 0) py += 3;
  int nb, xW, yW;
  mbaff_neighbor(t, t->cur_addr, px, py, 0, &nb, &xW, &yW);
  if (nb < 0 || t->f->slice_id[nb] != t->p->slice_id) return -1;
  *naddr = nb;
  *gcx = (nb % t->mb_w) * 4 + (xW >> 2);
  *gcy = (nb / t->mb_w) * 4 + (yW >> 2);
  return 0;
}

// 8.4.1.3.2 unit conversion when neighbor and current differ in frame/
// field coding: field refs double per frame, vertical MVs halve per field
static inline void convert_mv_ref(Ctx* t, int naddr, int* mvy, int* ref) {
  int nf = t->f->mb_field[naddr];
  if (nf == t->cur_field || *ref < 0) return;
  if (t->cur_field) {  // neighbor is a frame MB
    int vy = *mvy;
    *mvy = vy >= 0 ? vy / 2 : -((-vy) / 2);
    *ref = *ref * 2;
  } else {
    *mvy = *mvy * 2;
    *ref = *ref >> 1;
  }
}

static inline int nbr_mb(Ctx* t, int addr, int dx, int dy) {
  if (t->mbaff) {
    int nb, xW, yW;
    mbaff_neighbor(t, addr, dx ? -1 : 0, dy ? -1 : 0, 0, &nb, &xW, &yW);
    return (nb >= 0 && mb_avail(t, nb)) ? nb : -1;
  }
  int mbx = addr % t->mb_w, mby = addr / t->mb_w;
  int nx = mbx + dx, ny = mby + dy;
  if (nx < 0 || ny < 0 || nx >= t->mb_w) return -1;
  int naddr = ny * t->mb_w + nx;
  return mb_avail(t, naddr) ? naddr : -1;
}

static inline bool cip_barred(Ctx* t, int naddr) {
  // constrained_intra_pred bars inter neighbors; SI MBs stay usable
  int cls = t->f->mb_class[naddr];
  return t->p->constrained_intra && cls >= 3 && cls != MB_SI;
}

static int pred_intra_mode(Ctx* t, int gx, int gy) {
  int modes[2];
  int coords[2][2] = {{gx - 1, gy}, {gx, gy - 1}};
  for (int i = 0; i < 2; i++) {
    int nx = coords[i][0], ny = coords[i][1];
    if (nx < 0 || ny < 0) { modes[i] = -1; continue; }
    int naddr = (ny >> 2) * t->mb_w + (nx >> 2);
    if (!mb_avail(t, naddr)) { modes[i] = -1; continue; }
    if (cip_barred(t, naddr)) { modes[i] = -1; continue; }
    int m = t->f->mode_grid[ny * t->W4 + nx];
    modes[i] = m < 0 ? 2 : m;
  }
  int pred = modes[0] < modes[1] ? modes[0] : modes[1];
  return pred < 0 ? 2 : pred;
}

// 8.3.1.1 for MBAFF slices: neighbors via 6.4.10 at MB-local (x0, y0)
static int pred_intra_mode_mbaff(Ctx* t, int addr, int x0, int y0) {
  int modes[2];
  int coords[2][2] = {{x0 - 1, y0}, {x0, y0 - 1}};
  for (int i = 0; i < 2; i++) {
    int nb, xW, yW;
    mbaff_neighbor(t, addr, coords[i][0], coords[i][1], 0, &nb, &xW, &yW);
    if (nb < 0 || !mb_avail(t, nb) || cip_barred(t, nb)) { modes[i] = -1; continue; }
    int gx = (nb % t->mb_w) * 4 + (xW >> 2);
    int gy = (nb / t->mb_w) * 4 + (yW >> 2);
    int m = t->f->mode_grid[gy * t->W4 + gx];
    modes[i] = m < 0 ? 2 : m;
  }
  int pred = modes[0] < modes[1] ? modes[0] : modes[1];
  return pred < 0 ? 2 : pred;
}

static inline int update_qp(Ctx* t, int delta) {
  // spec 7-37: QPy wraps over [-QpBdOffsetY, 51]
  int off = t->qp_bd_offset;
  t->qp_prev = ((t->qp_prev + delta + 52 + 2 * off) % (52 + off)) - off;
  return t->qp_prev;
}

static void store_part(Ctx* t, int addr, int dx, int dy, int w, int h,
                       int mvx, int mvy, int ref, int lst) {
  FrameBuffers* f = t->f;
  const int32_t* uids = lst == 0 ? t->p->ref_uids0 : t->p->ref_uids1;
  int n_uids = lst == 0 ? t->p->n_ref0 : t->p->n_ref1;
  for (int cy = dy; cy < dy + h; cy++)
    for (int cx = dx; cx < dx + w; cx++) {
      int blk = cy * 4 + cx;
      f->mv[((addr * 2 + lst) * 16 + blk) * 2 + 0] = (int16_t)mvx;
      f->mv[((addr * 2 + lst) * 16 + blk) * 2 + 1] = (int16_t)mvy;
    }
  // field MBs (MBAFF) carry FIELD ref indices (8.4.2.1: index 2k = same
  // parity of frame-list entry k); resolve the frame uid + parity here
  int fld = t->mbaff && f->mb_field[addr];
  int uid, parity;
  if (fld && ref >= 0) {
    int mb_par = (addr / t->mb_w) & 1;
    int frame_ref = ref >> 1;
    parity = (ref & 1) == 0 ? mb_par : 1 - mb_par;
    uid = frame_ref < n_uids ? uids[frame_ref] : -1;
  } else {
    parity = -1;
    uid = (ref >= 0 && ref < n_uids) ? uids[ref] : -1;
  }
  for (int py = dy / 2; py < (dy + h + 1) / 2; py++)
    for (int px = dx / 2; px < (dx + w + 1) / 2; px++) {
      int part = py * 2 + px;
      f->ref_idx[(addr * 2 + lst) * 4 + part] = (int8_t)ref;
      f->pred_flags[(addr * 2 + lst) * 4 + part] = ref >= 0 ? 1 : 0;
      f->ref_pic[(addr * 2 + lst) * 4 + part] = uid;
      f->ref_parity[(addr * 2 + lst) * 4 + part] = (int8_t)parity;
    }
}

static inline void g_set_cells(Ctx* t, int lst, int bx, int by, int w, int h,
                               int mvx, int mvy, int ref) {
  FrameBuffers* f = t->f;
  for (int y = by; y < by + h; y++)
    for (int x = bx; x < bx + w; x++) {
      int idx = (lst * t->H4 + y) * t->W4 + x;
      f->g_mv[idx * 2 + 0] = mvx;
      f->g_mv[idx * 2 + 1] = mvy;
      f->g_ref[idx] = (int8_t)ref;
      f->g_refctx[idx] = (int8_t)ref;
    }
}

static inline void g_set_absmvd(Ctx* t, int lst, int bx, int by, int w, int h,
                                int ax, int ay) {
  FrameBuffers* f = t->f;
  for (int y = by; y < by + h; y++)
    for (int x = bx; x < bx + w; x++) {
      int idx = (lst * t->H4 + y) * t->W4 + x;
      f->g_absmvd[idx * 2 + 0] = ax;
      f->g_absmvd[idx * 2 + 1] = ay;
    }
}

static void set_intra_cells(Ctx* t, int addr) {
  int mbx = addr % t->mb_w, mby = addr / t->mb_w;
  for (int lst = 0; lst < 2; lst++)
    for (int y = mby * 4; y < mby * 4 + 4; y++)
      for (int x = mbx * 4; x < mbx * 4 + 4; x++) {
        int idx = (lst * t->H4 + y) * t->W4 + x;
        t->f->g_mv[idx * 2] = 0;
        t->f->g_mv[idx * 2 + 1] = 0;
        t->f->g_ref[idx] = NO_LIST;
        t->f->g_refctx[idx] = NO_LIST;
      }
}

// mv_pred.py: cell lookup with availability semantics
static inline void cell(Ctx* t, int lst, int cx, int cy, int* mvx, int* mvy,
                        int* ref) {
  if (t->mbaff) {
    // (cx, cy) interpreted relative to the current MB, routed through the
    // Table 6-4 mapper with 8.4.1.3.2 unit conversion (mv_pred.py)
    int naddr, gcx, gcy;
    if (resolve_cell(t, cx, cy, &naddr, &gcx, &gcy) < 0) {
      *mvx = *mvy = 0; *ref = UNAVAIL; return;
    }
    int idx = (lst * t->H4 + gcy) * t->W4 + gcx;
    int r = t->f->g_ref[idx];
    if (r == UNAVAIL) { *mvx = *mvy = 0; *ref = UNAVAIL; return; }
    *mvx = t->f->g_mv[idx * 2];
    *mvy = t->f->g_mv[idx * 2 + 1];
    *ref = r;
    convert_mv_ref(t, naddr, mvy, ref);
    return;
  }
  if (cx < 0 || cy < 0 || cx >= t->W4 || cy >= t->H4) {
    *mvx = *mvy = 0; *ref = UNAVAIL; return;
  }
  int naddr = (cy >> 2) * t->mb_w + (cx >> 2);
  if (t->f->slice_id[naddr] != t->p->slice_id) {
    *mvx = *mvy = 0; *ref = UNAVAIL; return;
  }
  int idx = (lst * t->H4 + cy) * t->W4 + cx;
  int r = t->f->g_ref[idx];
  if (r == UNAVAIL) { *mvx = *mvy = 0; *ref = UNAVAIL; return; }
  *mvx = t->f->g_mv[idx * 2];
  *mvy = t->f->g_mv[idx * 2 + 1];
  *ref = r;
}

static inline int med3(int a, int b, int c) {
  int mx = a > b ? a : b; mx = mx > c ? mx : c;
  int mn = a < b ? a : b; mn = mn < c ? mn : c;
  return a + b + c - mx - mn;
}

// part_shape: 0 none, 1 16x8, 2 8x16
static void predict_mv(Ctx* t, int lst, int ref, int bx, int by, int w, int h,
                       int shape, int part_idx, int* px, int* py) {
  int amx, amy, ar, bmx, bmy, br, cmx, cmy, cr;
  cell(t, lst, bx - 1, by, &amx, &amy, &ar);
  cell(t, lst, bx, by - 1, &bmx, &bmy, &br);
  cell(t, lst, bx + w, by - 1, &cmx, &cmy, &cr);
  if (cr == UNAVAIL) cell(t, lst, bx - 1, by - 1, &cmx, &cmy, &cr);
  if (shape == 1) {
    if (part_idx == 0 && br == ref) { *px = bmx; *py = bmy; return; }
    if (part_idx == 1 && ar == ref) { *px = amx; *py = amy; return; }
  } else if (shape == 2) {
    if (part_idx == 0 && ar == ref) { *px = amx; *py = amy; return; }
    if (part_idx == 1 && cr == ref) { *px = cmx; *py = cmy; return; }
  }
  int match = (ar == ref) + (br == ref) + (cr == ref);
  if (match == 1) {
    if (ar == ref) { *px = amx; *py = amy; }
    else if (br == ref) { *px = bmx; *py = bmy; }
    else { *px = cmx; *py = cmy; }
    return;
  }
  if (match == 0 && br == UNAVAIL && cr == UNAVAIL && ar != UNAVAIL) {
    *px = amx; *py = amy; return;
  }
  *px = med3(amx, bmx, cmx);
  *py = med3(amy, bmy, cmy);
}

static void skip_mv(Ctx* t, int bx, int by, int* px, int* py) {
  int amx, amy, ar, bmx, bmy, br;
  cell(t, 0, bx - 1, by, &amx, &amy, &ar);
  cell(t, 0, bx, by - 1, &bmx, &bmy, &br);
  if (ar == UNAVAIL || br == UNAVAIL ||
      (ar == 0 && amx == 0 && amy == 0) || (br == 0 && bmx == 0 && bmy == 0)) {
    *px = 0; *py = 0; return;
  }
  predict_mv(t, 0, 0, bx, by, 4, 4, 0, 0, px, py);
}

static inline int next_mb_addr(Ctx* t, int addr) {
  // 8.2.2.8 next MB address in decode order: identity +1 without FMO,
  // else the host-precomputed same-slice-group successor LUT
  if (t->p->has_mb_next) return t->p->mb_next[addr];
  return addr + 1;
}

static int mb_prelude(Ctx* t, int addr) {
  FrameBuffers* f = t->f;
  // decode_order has capacity n (one entry per MB of the frame); corrupt
  // streams with overlapping slices would otherwise run it off the end
  if (*f->n_decoded >= t->n) return -1;
  begin_mb(t, addr);
  f->slice_id[addr] = t->p->slice_id;
  f->decode_order[(*f->n_decoded)++] = addr;
  f->disable_deblock[addr] = (int8_t)t->p->disable_deblock;
  f->alpha_off[addr] = (int8_t)t->p->alpha_off;
  f->beta_off[addr] = (int8_t)t->p->beta_off;
  f->sp_slice_mb[addr] = (uint8_t)t->p->sp_slice;
  return 0;
}

// ---------------------------------------------------------------------------
// Direct derivation (direct.py)
// ---------------------------------------------------------------------------

static inline int min_positive(int a, int b) {
  if (a >= 0 && b >= 0) return a < b ? a : b;
  return a > b ? a : b;
}

struct DirectCell { int mv0x, mv0y, ref0, mv1x, mv1y, ref1; };

static const int kInferCorner[4][2] = {{0, 0}, {3, 0}, {0, 3}, {3, 3}};

// (refIdxCol, mvCol) of the colocated cell — the 8.4.1.2.1 AFRM frame/
// field crossings: col grids are in the col picture's own spatial-local
// layout and per-MB units; vertMvScale converts Frm<->Fld vertical units
// (direct.py _col_motion). Returns -1 when no colocated data exists.
static int col_motion(Ctx* t, int ccx, int ccy,
                      int* cref, int* cmvx, int* cmvy,
                      int* gy_out = nullptr, int* col_fld_out = nullptr) {
  const SliceParams* p = t->p;
  if (!p->n_col) return -1;
  int mb_w = t->mb_w;
  auto ret = [&](int gy, int col_fld) {
    if (gy_out) *gy_out = gy;
    if (col_fld_out) *col_fld_out = col_fld;
    return 0;
  };
  if (!t->mbaff) {
    *cref = p->col_ref_idx[ccy * t->W4 + ccx];
    *cmvx = p->col_mv[(ccy * t->W4 + ccx) * 2];
    *cmvy = p->col_mv[(ccy * t->W4 + ccx) * 2 + 1];
    return ret(ccy, 0);
  }
  int addr = (ccy / 4) * mb_w + (ccx / 4);
  int row = addr / mb_w;
  int pr = row / 2, par = row & 1;
  int ly = ccy - row * 4;
  int cur_fld = t->f->mb_field[addr];
  int pair_top = 2 * pr * mb_w + (addr % mb_w);
  // a null col_mb_field means the colocated picture coded no field pairs
  // (direct.py treats missing flags as all-frame and still crosses)
  int col_pair_fld =
      p->col_mb_field != nullptr ? p->col_mb_field[pair_top] : 0;
  if (cur_fld == col_pair_fld) {
    *cref = p->col_ref_idx[ccy * t->W4 + ccx];
    *cmvx = p->col_mv[(ccy * t->W4 + ccx) * 2];
    *cmvy = p->col_mv[(ccy * t->W4 + ccx) * 2 + 1];
    return ret(ccy, col_pair_fld);
  }
  if (cur_fld) {
    // current FIELD, colocated FRAME pair (Frm_To_Fld): strip row
    // 8*ly + par selects the top/bottom frame MB; vertical halves
    int sr = 8 * ly + par;
    int col_addr = pair_top + (sr >= 16 ? mb_w : 0);
    int gy = (col_addr / mb_w) * 4 + ((sr % 16) >> 2);
    *cref = p->col_ref_idx[gy * t->W4 + ccx];
    *cmvx = p->col_mv[(gy * t->W4 + ccx) * 2];
    int vy = p->col_mv[(gy * t->W4 + ccx) * 2 + 1];
    *cmvy = vy >= 0 ? vy / 2 : -((-vy) / 2);
    return ret(gy, 0);
  }
  // current FRAME, colocated FIELD pair (Fld_To_Frm): the field whose POC
  // is closer to the current picture; vertical doubles
  int db = p->col_bottom_poc - p->cur_poc;
  int dt = p->col_top_poc - p->cur_poc;
  int par_sel = (db < 0 ? -db : db) < (dt < 0 ? -dt : dt) ? 1 : 0;
  int sr = 16 * par + 4 * ly;
  int col_addr = pair_top + (par_sel ? mb_w : 0);
  int gy = (col_addr / mb_w) * 4 + ((sr >> 1) >> 2);
  *cref = p->col_ref_idx[gy * t->W4 + ccx];
  *cmvx = p->col_mv[(gy * t->W4 + ccx) * 2];
  *cmvy = p->col_mv[(gy * t->W4 + ccx) * 2 + 1] * 2;
  return ret(gy, 1);
}

static int derive_direct(Ctx* t, int bx0, int by0, DirectCell out[16]) {
  const SliceParams* p = t->p;
  if (p->spatial_direct) {
    int refs[2], mvs[2][2];
    for (int lst = 0; lst < 2; lst++) {
      int amx, amy, ar, bmx, bmy, br, cmx, cmy, cr;
      cell(t, lst, bx0 - 1, by0, &amx, &amy, &ar);
      cell(t, lst, bx0, by0 - 1, &bmx, &bmy, &br);
      cell(t, lst, bx0 + 4, by0 - 1, &cmx, &cmy, &cr);
      if (cr == UNAVAIL) cell(t, lst, bx0 - 1, by0 - 1, &cmx, &cmy, &cr);
      int rr = min_positive(ar, min_positive(br, cr));
      if (rr < 0) rr = -1;
      refs[lst] = rr;
      if (rr >= 0) {
        predict_mv(t, lst, rr, bx0, by0, 4, 4, 0, 0, &mvs[lst][0], &mvs[lst][1]);
      } else {
        mvs[lst][0] = mvs[lst][1] = 0;
      }
    }
    bool direct_zero = refs[0] < 0 && refs[1] < 0;
    if (direct_zero) { refs[0] = refs[1] = 0; mvs[0][0] = mvs[0][1] = mvs[1][0] = mvs[1][1] = 0; }
    for (int q = 0; q < 4; q++) {
      int qx = bx0 + (q % 2) * 2, qy = by0 + (q / 2) * 2;
      for (int sy = 0; sy < 2; sy++)
        for (int sx = 0; sx < 2; sx++) {
          int cx = qx + sx, cy = qy + sy;
          int ccx = cx, ccy = cy;
          if (p->direct_8x8_inference) {
            ccx = bx0 + kInferCorner[q][0];
            ccy = by0 + kInferCorner[q][1];
          }
          bool col_zero = false;
          if (!direct_zero && p->n_col && p->col_short_term) {
            int cref, cmvx, cmvy;
            if (col_motion(t, ccx, ccy, &cref, &cmvx, &cmvy) == 0)
              col_zero = (cref == 0 && cmvx >= -1 && cmvx <= 1 &&
                          cmvy >= -1 && cmvy <= 1);
          }
          DirectCell* dc = &out[(cy - by0) * 4 + (cx - bx0)];
          dc->ref0 = dc->ref1 = -1;
          dc->mv0x = dc->mv0y = dc->mv1x = dc->mv1y = 0;
          for (int lst = 0; lst < 2; lst++) {
            if (refs[lst] >= 0) {
              int mx = mvs[lst][0], my = mvs[lst][1];
              if (direct_zero || (col_zero && refs[lst] == 0)) { mx = 0; my = 0; }
              if (lst == 0) { dc->mv0x = mx; dc->mv0y = my; dc->ref0 = refs[lst]; }
              else { dc->mv1x = mx; dc->mv1y = my; dc->ref1 = refs[lst]; }
            }
          }
        }
    }
    return 0;
  } else {
    // temporal direct (8.4.1.2.3). MBAFF pictures with field macroblocks
    // run the field variant (direct.py _temporal_direct): the colocated
    // cell comes through the 8.4.1.2.1 AFRM crossing (vertMvScale applied
    // by col_motion), refIdxCol maps into the current FIELD reference
    // list by (frame position, field parity), and tb/td use FIELD order
    // counts
    bool mbaff_fields = t->mbaff && t->any_field;
    int cur_addr = (by0 / 4) * t->mb_w + bx0 / 4;
    bool cur_fld = mbaff_fields && t->f->mb_field[cur_addr];
    int cur_par = cur_fld ? ((by0 / 4) & 1) : -1;
    for (int q = 0; q < 4; q++) {
      int qx = bx0 + (q % 2) * 2, qy = by0 + (q / 2) * 2;
      for (int sy = 0; sy < 2; sy++)
        for (int sx = 0; sx < 2; sx++) {
          int cx = qx + sx, cy = qy + sy;
          int ccx = cx, ccy = cy;
          if (p->direct_8x8_inference) {
            ccx = bx0 + kInferCorner[q][0];
            ccy = by0 + kInferCorner[q][1];
          }
          int ref0 = 0, mcx = 0, mcy = 0;
          int frame_pos = 0, ref_par = cur_fld ? cur_par : -1;
          int poc0, cur_poc, poc1, lt0;
          if (!mbaff_fields) {
            if (p->n_col && p->col_ref_idx[ccy * t->W4 + ccx] >= 0) {
              mcx = p->col_mv[(ccy * t->W4 + ccx) * 2];
              mcy = p->col_mv[(ccy * t->W4 + ccx) * 2 + 1];
              int uid = p->col_ref_uid[ccy * t->W4 + ccx];
              for (int i = 0; i < p->n_ref0; i++)
                if (p->ref_uids0[i] == uid) { ref0 = i; break; }
            }
            poc0 = p->l0_pocs[ref0];
            lt0 = p->l0_lt[ref0];
            cur_poc = p->cur_poc;
            poc1 = p->col_poc;
          } else {
            int cref = -1, gy = ccy, col_fld = 0;
            if (col_motion(t, ccx, ccy, &cref, &mcx, &mcy, &gy,
                           &col_fld) != 0)
              cref = -1;
            if (cref < 0) {
              mcx = mcy = 0;
            } else {
              int uid = p->col_ref_uid[gy * t->W4 + ccx];
              for (int i = 0; i < p->n_ref0; i++)
                if (p->ref_uids0[i] == uid) { frame_pos = i; break; }
              ref_par = (col_fld && p->col_ref_parity != nullptr)
                            ? p->col_ref_parity[gy * t->W4 + ccx]
                            : -1;
            }
            if (cur_fld) {
              // field list index: 2k = same parity, 2k+1 = opposite
              bool same = ref_par < 0 || ref_par == cur_par;
              ref0 = 2 * frame_pos + (same ? 0 : 1);
              int rp = ref_par < 0 ? cur_par : ref_par;
              const int32_t* pocs = rp ? p->l0_bottom_pocs : p->l0_top_pocs;
              poc0 = (pocs != nullptr && frame_pos < p->n_l0_field)
                         ? pocs[frame_pos]
                         : 0;
              cur_poc = cur_par ? p->cur_bottom_poc : p->cur_top_poc;
              // colPic = same-parity field of RefPicList1[0]
              poc1 = cur_par ? p->col_bottom_poc : p->col_top_poc;
            } else {
              ref0 = frame_pos;
              poc0 = p->l0_pocs[frame_pos];
              cur_poc = p->cur_poc;
              poc1 = p->col_poc;
            }
            lt0 = p->l0_lt[frame_pos];
          }
          DirectCell* dc = &out[(cy - by0) * 4 + (cx - bx0)];
          if (lt0 || poc1 == poc0) {
            dc->mv0x = mcx; dc->mv0y = mcy;
            dc->mv1x = 0; dc->mv1y = 0;
          } else {
            int tb = clip3(-128, 127, cur_poc - poc0);
            int td = clip3(-128, 127, poc1 - poc0);
            int tx;
            if (td > 0) tx = (16384 + (td < 0 ? -td : td) / 2) / td;
            else tx = -((16384 + (td < 0 ? -td : td) / 2) / -td);
            int dsf = clip3(-1024, 1023, (tb * tx + 32) >> 6);
            dc->mv0x = (dsf * mcx + 128) >> 8;
            dc->mv0y = (dsf * mcy + 128) >> 8;
            dc->mv1x = dc->mv0x - mcx;
            dc->mv1y = dc->mv0y - mcy;
          }
          dc->ref0 = ref0;
          dc->ref1 = 0;
        }
    }
  }
  return 0;
}

static void store_direct(Ctx* t, int addr, DirectCell cells[16], int quad) {
  int bx0 = (addr % t->mb_w) * 4, by0 = (addr / t->mb_w) * 4;
  int qs = quad < 0 ? 0 : quad, qe = quad < 0 ? 4 : quad + 1;
  for (int q = qs; q < qe; q++)
    for (int sy = 0; sy < 2; sy++)
      for (int sx = 0; sx < 2; sx++) {
        int dx = (q % 2) * 2 + sx, dy = (q / 2) * 2 + sy;
        DirectCell* dc = &cells[dy * 4 + dx];
        t->g_direct[(by0 + dy) * t->W4 + bx0 + dx] = 1;
        g_set_cells(t, 0, bx0 + dx, by0 + dy, 1, 1, dc->mv0x, dc->mv0y,
                    dc->ref0 >= 0 ? dc->ref0 : -1);
        g_set_cells(t, 1, bx0 + dx, by0 + dy, 1, 1, dc->mv1x, dc->mv1y,
                    dc->ref1 >= 0 ? dc->ref1 : -1);
        store_part(t, addr, dx, dy, 1, 1, dc->mv0x, dc->mv0y, dc->ref0, 0);
        store_part(t, addr, dx, dy, 1, 1, dc->mv1x, dc->mv1y, dc->ref1, 1);
      }
}

static void clear_nnz_mb(Ctx* t, int addr, int val) {
  int mbx = addr % t->mb_w, mby = addr / t->mb_w;
  for (int y = 0; y < 4; y++)
    for (int x = 0; x < 4; x++)
      t->f->luma_nnz[(mby * 4 + y) * t->W4 + mbx * 4 + x] = (int8_t)val;
  int cr = t->ch_rows;
  for (int comp = 0; comp < 2; comp++)
    for (int y = 0; y < cr; y++)
      for (int x = 0; x < 2; x++)
        t->f->chroma_nnz[(comp * t->H2 + mby * cr + y) * t->W2 + mbx * 2 + x] =
            (int8_t)val;
  if (t->cf == 3)
    for (int comp = 0; comp < 2; comp++)
      for (int y = 0; y < 4; y++)
        for (int x = 0; x < 4; x++)
          t->f->c444_nnz[(comp * t->H4 + mby * 4 + y) * t->W4 + mbx * 4 + x] =
              (int8_t)val;
}

static int decode_p_skip(Ctx* t, int addr) {
  if (mb_prelude(t, addr) < 0) return -1;
  FrameBuffers* f = t->f;
  f->mb_class[addr] = MB_P_SKIP;
  f->qp[addr] = (int8_t)t->qp_prev;
  f->cbp[addr] = 0;
  int bx = (addr % t->mb_w) * 4, by = (addr / t->mb_w) * 4;
  int mvx, mvy;
  skip_mv(t, bx, by, &mvx, &mvy);
  g_set_cells(t, 0, bx, by, 4, 4, mvx, mvy, 0);
  for (int y = by; y < by + 4; y++)
    for (int x = bx; x < bx + 4; x++) {
      t->f->g_ref[(1 * t->H4 + y) * t->W4 + x] = NO_LIST;
      t->f->g_refctx[(1 * t->H4 + y) * t->W4 + x] = NO_LIST;
    }
  store_part(t, addr, 0, 0, 4, 4, mvx, mvy, 0, 0);
  clear_nnz_mb(t, addr, 0);
  return 0;
}

static int decode_b_skip(Ctx* t, int addr) {
  if (mb_prelude(t, addr) < 0) return -1;
  FrameBuffers* f = t->f;
  f->mb_class[addr] = MB_B_SKIP;
  f->qp[addr] = (int8_t)t->qp_prev;
  f->cbp[addr] = 0;
  DirectCell cells[16];
  if (derive_direct(t, (addr % t->mb_w) * 4, (addr / t->mb_w) * 4, cells) < 0)
    return -1;
  store_direct(t, addr, cells, -1);
  clear_nnz_mb(t, addr, 0);
  return 0;
}

#include "entropy_cavlc.inc"
#include "entropy_cabac.inc"

// ---------------------------------------------------------------------------
// Slice decode entry point
// ---------------------------------------------------------------------------

int decode_slice(const uint8_t* rbsp, int64_t rbsp_len, int64_t start_bit,
                 const SliceParams* p, FrameBuffers* f) {
  Ctx t;
  t.p = p;
  t.f = f;
  t.mb_w = p->mb_w;
  t.mb_h = p->mb_h;
  t.n = p->mb_w * p->mb_h;
  t.H4 = p->mb_h * 4;
  t.W4 = p->mb_w * 4;
  t.cf = p->chroma_format;
  t.ch_rows = t.cf == 2 ? 4 : 2;
  t.ch_dc_n = t.cf == 2 ? 8 : 4;
  t.ch_blks = t.cf == 2 ? 8 : 4;
  t.ch_mb_h = (t.cf == 2 || t.cf == 3) ? 16 : 8;
  t.ch_w = t.cf == 3 ? 16 : 8;
  t.field_pic = p->field_pic;
  t.mbaff = p->mbaff;
  t.cur_addr = -1;
  t.cur_field = 0;
  t.cur_cx0 = t.cur_cy0 = 0;
  t.cur_pair_top_unknown = -1;
  t.any_field = 0;
  if (p->mbaff) {
    // a later slice of the same frame sees earlier pairs' field flags
    for (int i = 0; i < p->mb_w * p->mb_h; i++)
      if (t.f->mb_field[i]) { t.any_field = 1; break; }
  }
  t.H2 = p->mb_h * t.ch_rows;
  t.W2 = p->mb_w * 2;
  t.qp_bd_offset = 6 * ((p->bit_depth_luma > 8 ? p->bit_depth_luma : 8) - 8);
  t.qp_prev = p->slice_qp;
  t.last_qp_delta = 0;
  t.is_cabac = p->cabac;
  br_init(&t.r, rbsp, rbsp_len, start_bit);
  t.res_intra = t.res_inter = t.res = &t.r;
  t.missing_part = 0;
  if (p->has_dp) {
    t.res_intra = t.res_inter = nullptr;
    if (p->part_b) {
      br_init(&t.rB, p->part_b, p->part_b_len, p->part_b_bit);
      t.res_intra = &t.rB;
    }
    if (p->part_c) {
      br_init(&t.rC, p->part_c, p->part_c_len, p->part_c_bit);
      t.res_inter = &t.rC;
    }
    t.res = t.res_intra;
  }
  t.g_direct = (uint8_t*)calloc((size_t)t.H4 * t.W4, 1);
  int rc = p->cabac ? decode_slice_cabac(&t) : decode_slice_cavlc(&t);
  free(t.g_direct);
  if (rc < 0 && t.missing_part) return -4;  // absent B/C partition
  return rc;
}

}  // extern "C"
