/* C-accelerated XHTML parse kernel.
 *
 * Transcription of the pure-Python kernel in kernel/parser.py +
 * kernel/extract.py (which is the semantic source of truth, verified
 * byte-identical against the reference engine's golden fixtures).
 * Byte-class and entity tables are GENERATED from the Python modules
 * into xps_tables.h at build time; tests/test_accel.py differentially
 * fuzzes this module against the Python kernel.
 *
 * Error reporting returns (code, pos, aux ranges); the Python side
 * formats the exact reference-compatible message so the formatting
 * logic exists exactly once.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#if defined(__GLIBC__)
#include <malloc.h>
#endif
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#if defined(__SSE2__) || defined(__x86_64__)
#include <emmintrin.h>
#endif
#include "xps_tables.h"

#define K_HEAD 0
#define K_ELEM 1
#define K_TEXT 2

/* chartype masks (kernel/chartype.py) */
#define M_PCDATA 1
#define M_ATRNORM 4
#define M_SPACE 8
#define M_CLOSE 16
#define M_SYMBOL 64
#define M_START 128

#define CT(b) XPS_CHARTYPE[(unsigned char)(b)]

/* error codes (decoded by kernel/parser.py::_from_c) */
#define E_UNEXPECTED_END 1
#define E_TAG_NAME_START 2
#define E_ATTR_NAME_START 3
#define E_ATTR_EQ 4
#define E_ATTR_QUOTES 5
#define E_SELF_CLOSE_GT 6
#define E_NO_OPENING 7
#define E_CLOSE_EMPTY 8
#define E_CLOSE_MISMATCH 9
#define E_DOCTYPE_GT 10
#define E_UNSUPPORTED_CR 12
#define E_ATTRNORM_CORRUPT 13
#define E_NOMEM 14

typedef struct { int32_t *d; Py_ssize_t n, cap; } iv;

static int iv_init(iv *v, Py_ssize_t cap) {
    if (cap < 8) cap = 8;
    v->d = (int32_t *)malloc((size_t)cap * 4);
    v->n = 0; v->cap = cap;
    return v->d != NULL;
}
static inline int iv_push(iv *v, int32_t x) {
    if (v->n == v->cap) {
        Py_ssize_t nc = v->cap * 2;
        void *p = realloc(v->d, (size_t)nc * 4);
        if (!p) return 0;
        v->d = (int32_t *)p; v->cap = nc;
    }
    v->d[v->n++] = x;
    return 1;
}

typedef struct {
    uint8_t *buf;
    int64_t size;
    iv parent, prev_sib, next_sib, first_child, kind, loc_s, loc_e, at_s, at_e;
    iv depth;
    iv a_ns, a_ne, a_vs, a_ve;
    int64_t n_text, max_d;
    int err_code;
    int64_t err_pos;
    int64_t aux[4];
    /* parse-global ANCHORED ';' frontier (parser.py:_next_semi):
     * f_semi = first ';' at/after f_semi_a (-1 = none through EOF).
     * Forward consults refetch past the cache; rewound consults (the
     * attr quirk replay) scan only the short [q, anchor) window. */
    int64_t f_semi, f_semi_a;
} ctx_t;

static inline int64_t find_b(const uint8_t *buf, int64_t size, int64_t p, uint8_t c) {
    if (p >= size) return -1;
    const void *r = memchr(buf + p, c, (size_t)(size - p));
    return r ? (const uint8_t *)r - buf : -1;
}
static inline int64_t find_b_end(const uint8_t *buf, int64_t p, int64_t end, uint8_t c) {
    if (p >= end) return -1;
    const void *r = memchr(buf + p, c, (size_t)(end - p));
    return r ? (const uint8_t *)r - buf : -1;
}
/* first byte at/after p NOT matching mask; -1 if none before size */
static inline int64_t skip_class(const uint8_t *buf, int64_t size, int64_t p, int mask) {
    for (; p < size; p++)
        if (!(CT(buf[p]) & mask)) return p;
    return -1;
}
/* bounded substring skip: match must fit within [p, p+maxw); returns pos AFTER match */
static int64_t find_seq(const uint8_t *buf, int64_t size, int64_t p, int64_t maxw,
                        const char *pat, int plen) {
    if (p >= size) return -1;
    int64_t end = p + maxw; if (end > size) end = size;
    int64_t i = p;
    while (i + plen <= end) {
        const void *r = memchr(buf + i, (uint8_t)pat[0], (size_t)(end - plen - i + 1));
        if (!r) return -1;
        i = (const uint8_t *)r - buf;
        if (!memcmp(buf + i, pat, (size_t)plen)) return i + plen;
        i++;
    }
    return -1;
}

static const xps_ent *ent_lookup(const uint8_t *s, int64_t len) {
    /* generated first-char bucket (XPS_ENT_LO/CNT) narrows the sorted
     * 129-entry table to the same-initial run (max 10 entries); the
     * length pre-check skips most comparisons -- the previous binary
     * search paid ~7 memcmp PLT calls per entity on entity-dense text */
    int n = XPS_ENT_CNT[s[0]];
    const xps_ent *e = &XPS_ENTITIES[XPS_ENT_LO[s[0]]];
    for (int k = 0; k < n; k++, e++)
        if (e->nlen == (int)len && !memcmp(s, e->name, (size_t)len)) return e;
    return NULL;
}

static inline int utf8_enc(uint32_t v, uint8_t *out) {
    if (v < 0x80) { out[0] = (uint8_t)v; return 1; }
    if (v < 0x800) { out[0] = 0xC0 | (v >> 6); out[1] = 0x80 | (v & 0x3F); return 2; }
    if (v < 0x10000) {
        out[0] = 0xE0 | (v >> 12); out[1] = 0x80 | ((v >> 6) & 0x3F);
        out[2] = 0x80 | (v & 0x3F); return 3;
    }
    out[0] = 0xF0 | (v >> 18); out[1] = 0x80 | ((v >> 12) & 0x3F);
    out[2] = 0x80 | ((v >> 6) & 0x3F); out[3] = 0x80 | (v & 0x3F); return 4;
}

/* translate_sequence (parser.py:_translate_sequence): returns 1 + new
 * (from, to) on success, 0 on invalid escape. semi = caller-memoized
 * next-';' position at/after from (-1 none, -2 compute here) -- same
 * result, linear instead of quadratic on ';'-sparse entity-dense text. */
static int xlat_seq(ctx_t *c, int64_t from, int64_t to, int64_t *nf, int64_t *nt,
                    int64_t semi) {
    uint8_t *buf = c->buf;
    if (from >= c->size) return 0;
    int64_t end = (semi == -2)
        ? find_b(buf, c->size, from, ';')  /* document-global scan */
        : semi;
    if (end < 0) return 0;
    int number = buf[from] == '#';
    if (number) from++;
    int hexn = buf[from] == 'x';  /* lowercase only */
    if (hexn) from++;
    if (from == end) return 0;
    uint8_t tmp[4];
    const uint8_t *src; int64_t n;
    if (number) {
        uint32_t acc = 0;  /* wrapping u32, like release-mode Rust */
        if (hexn) {
            for (int64_t i = from; i < end; i++) {
                uint8_t ch = buf[i]; uint32_t v;
                if (ch >= '0' && ch <= '9') v = ch - '0';
                else if (ch >= 'a' && ch <= 'f') v = ch - 'a' + 10;
                else if (ch >= 'A' && ch <= 'F') v = ch - 'A' + 10;
                else return 0;
                acc = acc * 16 + v;
            }
        } else {
            for (int64_t i = from; i < end; i++) {
                uint8_t ch = buf[i];
                if (ch < '0' || ch > '9') return 0;
                acc = acc * 10 + (ch - '0');
            }
        }
        if (acc > 0x10FFFF || (acc >= 0xD800 && acc <= 0xDFFF)) return 0;
        n = utf8_enc(acc, tmp);
        src = tmp;
    } else {
        const xps_ent *e = ent_lookup(buf + from, end - from);
        if (!e) return 0;
        src = (const uint8_t *)e->val; n = e->vlen;
    }
    if (n > c->size - to) n = c->size - to;
    for (int64_t k = 0; k < n; k++) buf[to + k] = src[k];  /* n <= 4 */
    *nf = end + 1; *nt = to + n;
    return 1;
}

/* forward copy for the in-place compaction moves: dst < src always
 * (writes land strictly behind the read cursor), so a forward byte
 * loop is overlap-safe; the moved runs are usually a few bytes of
 * inter-entity text, where the memmove PLT call dominated the
 * entity-dense construct (~157k moves/MB at 3 entities per 20 bytes). */
static inline void move_back(uint8_t *buf, int64_t to, int64_t frm, int64_t n) {
    if (n > 32) { memmove(buf + to, buf + frm, (size_t)n); return; }
    for (int64_t k = 0; k < n; k++) buf[to + k] = buf[frm + k];
}

/* anchored document-global ';' frontier (parser.py:_next_semi for the
 * soundness argument: consulted regions are pristine in any successful
 * parse; the quirk replay live-scans its own value range and consults
 * this only from the value END). */
static int64_t next_semi(ctx_t *c, int64_t q) {
    int64_t f = c->f_semi, a = c->f_semi_a;
    if (q >= a) {
        if (f == -1 || f >= q) { c->f_semi_a = q; return f; }
        f = find_b(c->buf, c->size, q, ';');
        c->f_semi = f;
        c->f_semi_a = q;
        return f;
    }
    int64_t local = find_b_end(c->buf, q, a, ';');
    if (local >= 0) {
        c->f_semi = local;
        c->f_semi_a = q;
        return local;
    }
    c->f_semi_a = q;
    return f;
}

/* parse_pcdata: in-place entity expansion; returns new end, or -1 with
 * *crpos set on a raw CR (reference UB -> UnsupportedCR). */
static int64_t pcdata(ctx_t *c, int64_t start, int64_t end, int64_t *crpos,
                      int64_t seed_amp, int64_t seed_cr) {
    uint8_t *buf = c->buf;
    int64_t to = start, frm = start;
    /* memoized scan frontiers (parser.py:_parse_pcdata): '&' and '\r'
     * positions are monotone and the buffer at or beyond the read
     * cursor is immutable within this call, so each is found once, not
     * once per iteration (the rescans were quadratic: 0.9 MB/s on
     * entity-dense megabyte spans). The caller's fused scan_text pass
     * supplies the first positions as seeds, so the bytes up to the
     * first match are never re-scanned; ';' uses the ctx-global
     * frontier (one scan per DOCUMENT -- the per-call doc-global memo
     * stayed quadratic across nodes on semicolon-free entity-dense
     * input). -2 = stale (recompute), -1 = known absent. */
    int64_t na = seed_amp, nr = seed_cr;
    for (;;) {
        if (na != -1 && na < frm) na = find_b_end(buf, frm, end, '&');
        if (nr != -1 && nr < frm) nr = find_b_end(buf, frm, end, '\r');
        int64_t np = (na < 0) ? nr : (nr < 0 ? na : (na < nr ? na : nr));
        if (np < 0) np = end;
        if (np >= end) {
            if (frm != to) move_back(buf, to, frm, end - frm);
            to += end - frm;
            break;
        }
        if (np > frm) {
            if (frm != to) move_back(buf, to, frm, np - frm);
            to += np - frm;
        }
        if (buf[np] == '&') {
            int64_t nf, nt;
            int64_t semi = next_semi(c, np + 1);
            if (xlat_seq(c, np + 1, to, &nf, &nt, semi)) { frm = nf; to = nt; }
            else {
                if (frm != to) buf[to] = '&';
                frm = np + 1; to += 1;
            }
        } else {
            *crpos = np;
            return -1;
        }
    }
    return to;
}

/* normalize_attribute_value: fast path + quirk replay, exactly as
 * parser.py:_normalize_attr_fast/_normalize_attr_quirk. Returns new
 * end, or -1 with err set (AttrNormCorruption). */
static int64_t norm_attr(ctx_t *c, int64_t start, int64_t end) {
    uint8_t *buf = c->buf;
    uint8_t *saved = NULL;
    uint8_t sbuf[256];  /* typical attr values; heap only beyond (the
                           per-attr malloc/free pair was measurable on
                           entity-bearing-attr markup) */
    int64_t has_amp = find_b_end(buf, start, end, '&');
    if (has_amp >= 0) {
        saved = (end - start) <= (int64_t)sizeof(sbuf)
                    ? sbuf
                    : (uint8_t *)malloc((size_t)(end - start));
        if (!saved) { c->err_code = E_NOMEM; return -1; }
        memcpy(saved, buf + start, (size_t)(end - start));
    }
    /* fast path */
    {
        int64_t to = start, frm = start;
        int space_added = 0;
        for (;;) {
            int64_t np = frm;
            while (np < end && !(CT(buf[np]) & M_ATRNORM)) np++;
            if (np >= end) {
                if (frm != to) move_back(buf, to, frm, end - frm);
                to += end - frm;
                if (to > start && buf[to - 1] == ' ') to--;
                if (saved != sbuf) free(saved);
                return to;
            }
            if (np > frm) {
                move_back(buf, to, frm, np - frm);
                to += np - frm;
                space_added = 0;
            }
            if (buf[np] == '&') {
                int64_t nf, nt;
                if (!xlat_seq(c, np + 1, to, &nf, &nt,
                              next_semi(c, np + 1))) goto quirk;
                frm = nf; to = nt;
                space_added = 0;
            } else {
                if (!space_added && to != start) {
                    buf[to] = ' '; to++;
                    space_added = 1;
                }
                frm = np + 1;
            }
        }
    }
quirk:
    /* restore pristine value bytes, replay with the reference's
     * stale-`from` invalid-escape quirk; overruns flagged. */
    memcpy(buf + start, saved, (size_t)(end - start));
    if (saved != sbuf) free(saved);
    {
        int64_t to = start, frm = start;
        int space_added = 0;
        for (;;) {
            int64_t np = frm;
            while (np < end && !(CT(buf[np]) & M_ATRNORM)) np++;
            if (np >= end) {
                if (to + (end - frm) > end) goto corrupt;
                memmove(buf + to, buf + frm, (size_t)(end - frm));
                to += end - frm;
                if (to > start && buf[to - 1] == ' ') to--;
                return to;
            }
            if (np > frm) {
                if (to + (np - frm) > end) goto corrupt;
                memmove(buf + to, buf + frm, (size_t)(np - frm));
                to += np - frm;
                space_added = 0;
            }
            if (to > end) goto corrupt;
            if (buf[np] == '&') {
                int64_t nf, nt;
                /* LIVE scan within the value (the duplication quirk
                 * rewrites bytes ahead of np inside it); pristine
                 * frontier for the tail beyond the value */
                int64_t semi = find_b_end(buf, np + 1, end, ';');
                if (semi < 0) semi = next_semi(c, end);
                if (xlat_seq(c, np + 1, to, &nf, &nt, semi)) { frm = nf; to = nt; }
                else frm += 1;  /* the stale-from quirk: NOT np+1 */
                space_added = 0;
            } else {
                if (!space_added && to != start) {
                    if (to >= end) goto corrupt;
                    buf[to] = ' '; to++;
                    space_added = 1;
                }
                frm = np + 1;
            }
            continue;
        corrupt:
            c->err_code = E_ATTRNORM_CORRUPT;
            c->err_pos = to;
            return -1;
        }
    }
}

/* first-colon namespace strip. Names are a few bytes, so an inline
 * scan beats a PLT memchr call: measured 13.4k calls/parse averaging
 * 2.5 scanned bytes on the 960 KB book fixture -- pure call overhead
 * at that shape. */
static inline int64_t ns_strip(uint8_t *buf, int64_t start, int64_t end) {
    int64_t colon = -1;
    for (int64_t p = start; p < end; p++)
        if (buf[p] == ':') { colon = p; break; }
    if (colon < 0) return end;
    int64_t n = end - colon - 1;
    memmove(buf + start, buf + colon + 1, (size_t)n);
    return start + n;
}

/* one fused pass over a text run: position of the next '<' (or -1 if
 * none before EOF), plus the first '&' and the first '\r' strictly
 * before it (-1 each if absent in that window). Collapses the three
 * per-node scans (structure find + entity fast-path + CR fast-path)
 * into ONE sweep: the separate short scans ran startup-cost-bound at
 * ~3 GB/s effective on real markup (BENCH.md round 4). Python twin:
 * the bounded bfind pair + bfind('<') in parser.py _parse -- same
 * semantics, CPython's find IS the fast scan there. */
static int64_t scan_text(const uint8_t *buf, int64_t size, int64_t p,
                         int64_t *amp, int64_t *cr) {
    int64_t a = -1, r = -1;
#if defined(__SSE2__) || defined(__x86_64__)
    const __m128i v_lt = _mm_set1_epi8('<');
    const __m128i v_amp = _mm_set1_epi8('&');
    const __m128i v_cr = _mm_set1_epi8('\r');
    while (p + 16 <= size) {
        __m128i x = _mm_loadu_si128((const __m128i *)(buf + p));
        unsigned m_lt = (unsigned)_mm_movemask_epi8(_mm_cmpeq_epi8(x, v_lt));
        unsigned m_a = (unsigned)_mm_movemask_epi8(_mm_cmpeq_epi8(x, v_amp));
        unsigned m_r = (unsigned)_mm_movemask_epi8(_mm_cmpeq_epi8(x, v_cr));
        if (m_lt) {
            unsigned lt_off = (unsigned)__builtin_ctz(m_lt);
            unsigned before = (1u << lt_off) - 1u;
            if (a < 0 && (m_a & before)) a = p + __builtin_ctz(m_a & before);
            if (r < 0 && (m_r & before)) r = p + __builtin_ctz(m_r & before);
            *amp = a; *cr = r;
            return p + lt_off;
        }
        if (a < 0 && m_a) a = p + __builtin_ctz(m_a);
        if (r < 0 && m_r) r = p + __builtin_ctz(m_r);
        p += 16;
    }
#endif
    for (; p < size; p++) {
        uint8_t b = buf[p];
        if (b == '<') { *amp = a; *cr = r; return p; }
        if (b == '&' && a < 0) a = p;
        if (b == '\r' && r < 0) r = p;
    }
    *amp = a; *cr = r;
    return -1;
}

#define ADD_NODE(K, S, E) do {                                            \
    int32_t parent_idx = level ? stk_idx[level - 1] : 0;                  \
    int32_t idx = (int32_t)c->kind.n;                                     \
    if (c->first_child.d[parent_idx] == 0) {                              \
        c->first_child.d[parent_idx] = idx;                               \
        if (!iv_push(&c->prev_sib, idx)) goto nomem;                      \
    } else {                                                              \
        int32_t lci = level ? stk_last[level - 1] : 0;                    \
        c->next_sib.d[lci] = idx;                                         \
        c->prev_sib.d[c->first_child.d[parent_idx]] = idx;                \
        if (!iv_push(&c->prev_sib, lci)) goto nomem;                      \
    }                                                                     \
    if (!iv_push(&c->parent, parent_idx) || !iv_push(&c->next_sib, 0) ||  \
        !iv_push(&c->first_child, 0) || !iv_push(&c->kind, (K)) ||        \
        !iv_push(&c->loc_s, (int32_t)(S)) || !iv_push(&c->loc_e, (int32_t)(E)) || \
        !iv_push(&c->at_s, (int32_t)c->a_ns.n) ||                         \
        !iv_push(&c->at_e, (int32_t)c->a_ns.n) ||                         \
        !iv_push(&c->depth, (int32_t)(level + 1))) goto nomem;            \
    new_idx = idx;                                                        \
} while (0)

/* the state machine (parser.py:_parse). Returns 0 ok / -1 error (err set). */
static int do_parse(ctx_t *c) {
    uint8_t *buf = c->buf;
    const int64_t size = c->size;
    int64_t i = 0;

    int32_t *stk_idx = NULL, *stk_last = NULL;
    Py_ssize_t stk_cap = 64;
    stk_idx = (int32_t *)malloc((size_t)stk_cap * 4);
    stk_last = (int32_t *)malloc((size_t)stk_cap * 4);
    if (!stk_idx || !stk_last) goto nomem;
    Py_ssize_t level = 0;
    int64_t n_text = 0, max_d = 0;
    int32_t new_idx = 0;

    enum { ST_START, ST_TAGSTART, ST_TAGOPEN, ST_TAGCLOSE, ST_ATTR, ST_PCDATA, ST_END } st = ST_START;

    for (;;) {
        switch (st) {
        case ST_PCDATA: {
            int64_t space_start = i;
            i = skip_class(buf, size, i, M_SPACE);
            if (i < 0) { st = ST_END; break; }
            int64_t start = i;
            int64_t amp_in, cr_in;
            /* fused: next '<' + first '&'/'\r' in [space_start, lt) in
             * one pass ('<' cannot appear in the skipped ws run, so
             * starting from space_start finds the same '<'; '\r' IS
             * ws-class, so scanning from space_start reproduces the
             * reference's CR handling in leading whitespace exactly) */
            i = scan_text(buf, size, space_start, &amp_in, &cr_in);
            if (i < 0) goto unexpected_end;
            if (i > start) {
                start = space_start;
                int64_t crpos;
                int64_t ne;
                if (amp_in < 0 && cr_in < 0)
                    ne = i;
                else {
                    ne = pcdata(c, start, i, &crpos, amp_in, cr_in);
                    if (ne < 0) {
                        c->err_code = E_UNSUPPORTED_CR;
                        c->err_pos = crpos;
                        goto fail;
                    }
                }
                if (level > 0) {
                    ADD_NODE(K_TEXT, start, ne);
                    stk_last[level - 1] = new_idx;
                    n_text++;
                    if ((int64_t)level >= max_d) max_d = (int64_t)level + 1;
                } else goto unexpected_end;
            }
            i += 1;
            if (i >= size) goto unexpected_end;
            st = ST_TAGSTART;
            break;
        }
        case ST_TAGSTART: {
            uint8_t ch = buf[i];
            if (ch == '/') { i++; st = ST_TAGCLOSE; break; }
            if (ch == '!') {
                i++;
                if (i < size) {
                    if (i + 2 <= size && !memcmp(buf + i, "--", 2)) {
                        i += 2;
                        i = find_seq(buf, size, i, 5000, "-->", 3);
                        if (i < 0) goto unexpected_end;
                    } else if (i + 7 <= size && !memcmp(buf + i, "DOCTYPE", 7)) {
                        i += 7;
                        int64_t pg = find_b(buf, size, i, '>');
                        int64_t pb = find_b(buf, size, i, '[');
                        if (pg < 0 && pb < 0) goto unexpected_end;
                        if (pg < 0) i = pb; else if (pb < 0) i = pg; else i = pg < pb ? pg : pb;
                        if (buf[i] == '[') {
                            i = find_b(buf, size, i, ']');
                            if (i < 0) goto unexpected_end;
                            i += 1;
                            i = skip_class(buf, size, i, M_SPACE);
                            if (i < 0) goto unexpected_end;
                            if (buf[i] == '>') i += 1;
                            else { c->err_code = E_DOCTYPE_GT; c->err_pos = i; goto fail; }
                        }
                        i += 1;  /* reference skips one extra byte (src/parser.rs:977) */
                    } else if (i + 7 <= size && !memcmp(buf + i, "[CDATA[", 7)) {
                        i += 7;
                        i = find_seq(buf, size, i, 5000, "]]>", 3);
                        if (i < 0) goto unexpected_end;
                    } else goto unexpected_end;
                }
                st = (i >= size) ? ST_END : ST_PCDATA;
                break;
            }
            if (ch == '?') {
                i++;
                i = find_seq(buf, size, i, 500, "?>", 2);
                if (i < 0) goto unexpected_end;
                st = (i >= size) ? ST_END : ST_PCDATA;
                break;
            }
            st = ST_TAGOPEN;
            break;
        }
        case ST_TAGOPEN: {
            int64_t start = i;
            if (!(CT(buf[i]) & M_START)) {
                c->err_code = E_TAG_NAME_START; c->err_pos = i; goto fail;
            }
            i++;
            i = skip_class(buf, size, i, M_SYMBOL);
            if (i < 0) goto unexpected_end;
            int64_t name_end = ns_strip(buf, start, i);
            ADD_NODE(K_ELEM, start, name_end);
            if (level) stk_last[level - 1] = new_idx;
            if (level == (Py_ssize_t)stk_cap) {
                stk_cap *= 2;
                void *p1 = realloc(stk_idx, (size_t)stk_cap * 4);
                void *p2 = realloc(stk_last, (size_t)stk_cap * 4);
                if (!p1 || !p2) { if (p1) stk_idx = p1; if (p2) stk_last = p2; goto nomem; }
                stk_idx = (int32_t *)p1; stk_last = (int32_t *)p2;
            }
            stk_idx[level] = new_idx;
            stk_last[level] = 0;
            level++;
            if ((int64_t)level > max_d) max_d = (int64_t)level;
            if (buf[i] == '>') {
                i++;
                if (i >= size) goto unexpected_end;
                st = ST_PCDATA;
            } else st = ST_ATTR;
            break;
        }
        case ST_ATTR: {
            i = skip_class(buf, size, i, M_SPACE);
            if (i < 0) goto unexpected_end;
            uint8_t ch = buf[i];
            if (ch == '/') {
                i++;
                if (i >= size) goto unexpected_end;
                if (buf[i] != '>') { c->err_code = E_SELF_CLOSE_GT; c->err_pos = i; goto fail; }
                level--;
                if (level == 0) { st = ST_END; break; }
                i++;
                if (i >= size) goto unexpected_end;
                st = ST_PCDATA;
                break;
            }
            if (ch == '>') {
                i++;
                if (i >= size) goto unexpected_end;
                st = ST_PCDATA;
                break;
            }
            int64_t start = i;
            if (!(CT(ch) & M_START)) {
                c->err_code = E_ATTR_NAME_START; c->err_pos = i; goto fail;
            }
            i++;
            i = skip_class(buf, size, i, M_SYMBOL);
            if (i < 0) goto unexpected_end;
            if (buf[i] != '=') { c->err_code = E_ATTR_EQ; c->err_pos = i; goto fail; }
            int64_t name_end_raw = i;
            i++;
            if (i >= size) goto unexpected_end;
            uint8_t quote = buf[i];
            if (quote != '\'' && quote != '"') {
                c->err_code = E_ATTR_QUOTES; c->err_pos = i; goto fail;
            }
            i++;
            int64_t value_start = i;
            /* attribute values average ~8 bytes on real markup: check a
             * short inline window before paying the memchr call (the
             * generic find_b hybrid was A/B'd neutral, but HERE the
             * expected distance is known-short) */
            {
                int64_t lim = i + 16 < size ? i + 16 : size;
                while (i < lim && buf[i] != quote) i++;
                if (i == lim && lim == size) goto unexpected_end;
                if (i == lim) {
                    i = find_b(buf, size, i, quote);
                    if (i < 0) goto unexpected_end;
                }
            }
            int64_t value_end = norm_attr(c, value_start, i);
            if (value_end < 0) goto fail;
            int64_t a_name_end = ns_strip(buf, start, name_end_raw);
            if (level > 0) {
                int32_t owner = stk_idx[level - 1];
                if (!iv_push(&c->a_ns, (int32_t)start) ||
                    !iv_push(&c->a_ne, (int32_t)a_name_end) ||
                    !iv_push(&c->a_vs, (int32_t)value_start) ||
                    !iv_push(&c->a_ve, (int32_t)value_end)) goto nomem;
                c->at_e.d[owner] += 1;
            } else goto unexpected_end;
            i++;
            st = ST_ATTR;
            break;
        }
        case ST_TAGCLOSE: {
            int64_t start = i;
            /* scan_until_chartype(ParseCloseTag) */
            while (i < size && !(CT(buf[i]) & M_CLOSE)) i++;
            if (i >= size) goto unexpected_end;
            if (i == start) { c->err_code = E_CLOSE_EMPTY; c->err_pos = i; goto fail; }
            int64_t name_end = ns_strip(buf, start, i);
            int is_gt = buf[i] == '>';
            if (level > 0) {
                int32_t open_idx = stk_idx[level - 1];
                int64_t os = c->loc_s.d[open_idx], oe = c->loc_e.d[open_idx];
                if ((oe - os) != (name_end - start) ||
                    memcmp(buf + os, buf + start, (size_t)(name_end - start))) {
                    c->err_code = E_CLOSE_MISMATCH;
                    c->err_pos = start;
                    c->aux[0] = start; c->aux[1] = name_end;
                    c->aux[2] = os; c->aux[3] = oe;
                    goto fail;
                }
            } else { c->err_code = E_NO_OPENING; c->err_pos = i; goto fail; }
            level--;
            if (!is_gt) {
                i = find_b(buf, size, i + 1, '>');
                if (i < 0) goto unexpected_end;
            }
            i++;
            st = (i >= size) ? ST_END : ST_PCDATA;
            break;
        }
        case ST_START: {
            i = find_b(buf, size, i, '<');
            if (i < 0) goto unexpected_end;
            i++;
            if (i >= size) goto unexpected_end;
            st = ST_TAGSTART;
            break;
        }
        case ST_END:
            c->n_text = n_text;
            c->max_d = max_d;
            free(stk_idx); free(stk_last);
            return 0;
        }
    }

unexpected_end:
    c->err_code = E_UNEXPECTED_END;
    c->err_pos = -1;
    goto fail;
nomem:
    c->err_code = E_NOMEM;
    c->err_pos = -1;
fail:
    free(stk_idx); free(stk_last);
    return -1;
}

/* ---- main-content extraction (kernel/extract.py) ---- */

/* pref = generated (first char -> member-length bitmask) table: one
 * load rejects the common non-member tags without walking the list */
static inline int tag_in(const uint8_t *s, int64_t len,
                         const xps_tag *tags, int n,
                         const unsigned short *pref) {
    if (len >= 16 || !(pref[s[0]] & (1u << len))) return 0;
    for (int k = 0; k < n; k++)
        if (tags[k].len == len && !memcmp(s, tags[k].name, (size_t)len)) return 1;
    return 0;
}

static inline int is_pyws(uint8_t b) {
    return b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == 0x0b || b == 0x0c;
}

/* returns new references: (extracted_text, text_main) */
static int extract_texts(ctx_t *c, PyObject **out_text, PyObject **out_main) {
    Py_ssize_t n = c->kind.n;
    const int32_t *kind = c->kind.d, *par = c->parent.d;
    const int32_t *ls = c->loc_s.d, *le = c->loc_e.d;
    const uint8_t *buf = c->buf;

    /* main-text scratch: blacklist subtrees + link-density per block.
     * One malloc for all five arrays (the 64-bit arrays lead so every
     * slice stays aligned); only the tlen/llen accumulators need
     * zeroing -- bad/anch/blk are fully assigned by the stats walk,
     * which also sums the extracted-text total so the five node walks
     * of the original shape collapse to three. */
    size_t scratch_sz = (size_t)n * (8 + 8 + 4 + 1 + 1);
    uint8_t *scratch = (uint8_t *)malloc(scratch_sz ? scratch_sz : 1);
    if (!scratch) { PyErr_NoMemory(); return -1; }
    int64_t *tlen = (int64_t *)scratch;
    int64_t *llen = (int64_t *)(scratch + (size_t)n * 8);
    int32_t *blk = (int32_t *)(scratch + (size_t)n * 16);
    uint8_t *bad = scratch + (size_t)n * 20;
    uint8_t *anch = scratch + (size_t)n * 21;
    memset(scratch, 0, (size_t)n * 16);  /* tlen + llen */
    blk[0] = 0; bad[0] = 0; anch[0] = 0;
    int64_t total = 0;
    for (Py_ssize_t i = 1; i < n; i++) {
        int32_t p = par[i];
        if (kind[i] == K_ELEM) {
            const uint8_t *nm = buf + ls[i];
            int64_t nl = le[i] - ls[i];
            bad[i] = bad[p] ||
                tag_in(nm, nl, XPS_BLACKLIST, XPS_N_BLACKLIST, XPS_BLACKLIST_PREF);
            anch[i] = anch[p] || (nl == 1 && nm[0] == 'a');
            blk[i] = tag_in(nm, nl, XPS_BLOCK, XPS_N_BLOCK, XPS_BLOCK_PREF)
                ? (int32_t)i : blk[p];
        } else {
            int64_t tl = le[i] - ls[i];
            total += tl;
            if (bad[p]) { bad[i] = 1; continue; }
            bad[i] = 0;
            anch[i] = anch[p];
            blk[i] = blk[p];
            tlen[blk[i]] += tl;
            if (anch[i]) llen[blk[i]] += tl;
        }
    }
    PyObject *text = PyBytes_FromStringAndSize(NULL, total);
    if (!text) { free(scratch); return -1; }
    /* keep-decision memoized in `bad` (reused as "excluded"): the copy
     * pass below must apply the identical predicate, so evaluate the
     * link-density + whitespace tests once */
    int64_t mtotal = 0;
    for (Py_ssize_t i = 1; i < n; i++) {
        if (kind[i] != K_TEXT) continue;
        if (!bad[i]) {
            int64_t tl = tlen[blk[i]];
            int nonws = 0;
            if (!(tl > 0 &&
                  (double)llen[blk[i]] / (double)tl > XPS_LINK_DENSITY_MAX)) {
                for (int64_t j = ls[i]; j < le[i]; j++)
                    if (!is_pyws(buf[j])) { nonws = 1; break; }
            }
            if (nonws) { mtotal += le[i] - ls[i]; continue; }
            bad[i] = 1;
        }
    }
    PyObject *mtext = PyBytes_FromStringAndSize(NULL, mtotal);
    if (!mtext) {
        free(scratch);
        Py_DECREF(text); return -1;
    }
    {
        /* one walk writes BOTH outputs (text always, main when kept) */
        char *w = PyBytes_AS_STRING(text);
        char *wm = PyBytes_AS_STRING(mtext);
        for (Py_ssize_t i = 1; i < n; i++) {
            if (kind[i] != K_TEXT) continue;
            int64_t tl = le[i] - ls[i];
            memcpy(w, buf + ls[i], (size_t)tl);
            w += tl;
            if (!bad[i]) {
                memcpy(wm, buf + ls[i], (size_t)tl);
                wm += tl;
            }
        }
    }
    free(scratch);
    *out_text = text;
    *out_main = mtext;
    return 0;
}

static PyObject *iv_to_bytes(iv *v) {
    return PyBytes_FromStringAndSize((const char *)v->d, v->n * 4);
}

/* last_descendant[k] = largest j that is a descendant of k, via the
 * stack-free monotonic pass over the depth array (transcribes
 * kernel/extract.py::compute_depth_and_last_descendant). */
static PyObject *compute_last_desc(ctx_t *c) {
    Py_ssize_t n = c->kind.n;
    const int32_t *depth = c->depth.d;
    int32_t *ld = (int32_t *)malloc((size_t)n * 4);
    int32_t *stk = (int32_t *)malloc((size_t)n * 4);
    if (!ld || !stk) { free(ld); free(stk); return PyErr_NoMemory(); }
    for (Py_ssize_t i = 0; i < n; i++) ld[i] = (int32_t)i;
    Py_ssize_t sp = 0;
    for (Py_ssize_t i = 1; i < n; i++) {
        int32_t d = depth[i];
        while (sp && depth[stk[sp - 1]] >= d) ld[stk[--sp]] = (int32_t)(i - 1);
        stk[sp++] = (int32_t)i;
    }
    while (sp) ld[stk[--sp]] = (int32_t)(n - 1);
    PyObject *b = PyBytes_FromStringAndSize((const char *)ld, n * 4);
    free(ld); free(stk);
    return b;
}

/* ingest the input buffer and run the parse; returns 0 setup-ok (rc in
 * *prc), -1 alloc failure with the Python error set. Shared by the
 * full-marshal entry (py_parse) and the texts-only hot path
 * (py_parse_texts). */
/* fused input copy + '<' count: the capacity-estimation pass
 * (src/document.rs:74-107) used to re-read the fresh copy -- one
 * load-store-compare sweep does both (the count loop alone was ~20% of
 * run_parse in the instruction-level profile, all paddq/punpck). */
static int64_t copy_count_lt(uint8_t *dst, const uint8_t *src, int64_t n) {
    int64_t cnt = 0, p = 0;
#if defined(__SSE2__) || defined(__x86_64__)
    const __m128i v_lt = _mm_set1_epi8('<');
    const __m128i zero = _mm_setzero_si128();
    __m128i acc = zero;          /* two 64-bit lane sums */
    __m128i inner_acc = zero;    /* per-byte counts, flushed before overflow */
    int inner = 0;
    while (p + 16 <= n) {
        __m128i x = _mm_loadu_si128((const __m128i *)(src + p));
        _mm_storeu_si128((__m128i *)(dst + p), x);
        inner_acc = _mm_sub_epi8(inner_acc, _mm_cmpeq_epi8(x, v_lt));
        if (++inner == 255) {
            acc = _mm_add_epi64(acc, _mm_sad_epu8(inner_acc, zero));
            inner_acc = zero;
            inner = 0;
        }
        p += 16;
    }
    acc = _mm_add_epi64(acc, _mm_sad_epu8(inner_acc, zero));
    cnt = _mm_cvtsi128_si64(acc) +
          _mm_cvtsi128_si64(_mm_srli_si128(acc, 8));
#endif
    for (; p < n; p++) {
        dst[p] = src[p];
        cnt += (src[p] == '<');
    }
    return cnt;
}

static int run_parse(Py_buffer *in, ctx_t *c, int *prc) {
    memset(c, 0, sizeof(*c));

    c->size = in->len;
    c->buf = (uint8_t *)malloc((size_t)(in->len > 0 ? in->len : 1));
    if (!c->buf) { PyBuffer_Release(in); PyErr_NoMemory(); return -1; }
    /* pre-size from count('<') like the reference (src/document.rs:74-107),
     * fused with the mutable-copy pass (copy_count_lt above) */
    int64_t est = 8 + copy_count_lt(c->buf, (const uint8_t *)in->buf, in->len);
    PyBuffer_Release(in);
    /* vacuous "no ';' at/after EOF": first consult scans once */
    c->f_semi = -1;
    c->f_semi_a = c->size;
    int okmem = iv_init(&c->parent, est) && iv_init(&c->prev_sib, est) &&
                iv_init(&c->next_sib, est) && iv_init(&c->first_child, est) &&
                iv_init(&c->kind, est) && iv_init(&c->loc_s, est) &&
                iv_init(&c->loc_e, est) && iv_init(&c->at_s, est) &&
                iv_init(&c->at_e, est) && iv_init(&c->depth, est) &&
                iv_init(&c->a_ns, 16) &&
                iv_init(&c->a_ne, 16) && iv_init(&c->a_vs, 16) && iv_init(&c->a_ve, 16);
    if (!okmem) { PyErr_NoMemory(); return -1; }

    /* head node */
    iv_push(&c->parent, 0); iv_push(&c->prev_sib, 0); iv_push(&c->next_sib, 0);
    iv_push(&c->first_child, 0); iv_push(&c->kind, K_HEAD);
    iv_push(&c->loc_s, 0); iv_push(&c->loc_e, 0); iv_push(&c->at_s, 0); iv_push(&c->at_e, 0);
    iv_push(&c->depth, 0);

    *prc = do_parse(c);
    return 0;
}

static void free_ctx(ctx_t *c) {
    free(c->buf);
    free(c->parent.d); free(c->prev_sib.d); free(c->next_sib.d); free(c->first_child.d);
    free(c->kind.d); free(c->loc_s.d); free(c->loc_e.d); free(c->at_s.d); free(c->at_e.d);
    free(c->depth.d);
    free(c->a_ns.d); free(c->a_ne.d); free(c->a_vs.d); free(c->a_ve.d);
}

/* texts-only hot path (kernel/parser.py::parse_texts): same parse and
 * extraction, but NONE of the 14 node/attr arrays nor the rewritten
 * buffer is marshalled back to Python -- on tag-dense input that
 * marshalling costs as much as the parse itself, and parse_pages/the
 * fused sink never read the tree. On error the buffer IS returned (the
 * Python side renders the reference's 30-byte-context message from it).
 * Returns (ok, err_code, err_pos, (aux0..3), buf_or_None, text_or_None,
 * mtext_or_None, n_nodes, n_attrs, n_text, max_depth). */
static PyObject *py_parse_texts(PyObject *self, PyObject *args) {
    Py_buffer in;
    if (!PyArg_ParseTuple(args, "y*", &in)) return NULL;
    if (in.len > INT32_MAX / 2) {
        PyBuffer_Release(&in);
        Py_RETURN_NONE;
    }
    ctx_t c; int rc;
    if (run_parse(&in, &c, &rc) != 0) { free_ctx(&c); return NULL; }
    PyObject *result = NULL;
    if (rc != 0 && c.err_code == E_NOMEM) { PyErr_NoMemory(); goto done; }
    if (rc == 0) {
        PyObject *text = NULL, *mtext = NULL;
        if (extract_texts(&c, &text, &mtext) != 0) goto done;
        result = Py_BuildValue(
            "(iiL(LLLL)ONNLLLL)",
            1, 0, (long long)0,
            (long long)0, (long long)0, (long long)0, (long long)0,
            Py_None, text, mtext,
            (long long)(c.kind.n - 1), (long long)c.a_ns.n,
            (long long)c.n_text, (long long)c.max_d);
    } else {
        PyObject *buf_obj = PyBytes_FromStringAndSize((const char *)c.buf, c.size);
        if (!buf_obj) goto done;
        result = Py_BuildValue(
            "(iiL(LLLL)NOOLLLL)",
            0, c.err_code, (long long)c.err_pos,
            (long long)c.aux[0], (long long)c.aux[1],
            (long long)c.aux[2], (long long)c.aux[3],
            buf_obj, Py_None, Py_None,
            (long long)0, (long long)0, (long long)0, (long long)0);
    }
done:
    free_ctx(&c);
    return result;
}

/* parse-only probe: run_parse and free, nothing extracted or
 * marshalled -- the apples-to-apples counterpart of the reference's
 * speed test (Document::new builds the tree and returns; its
 * published GB/s pays no text extraction). Used by
 * jobs/speed_fixture_bench.py for the baseline comparison; NOT a
 * pipeline path. Returns (ok, err_code, err_pos, n_nodes, n_attrs,
 * n_text, max_depth) -- stats identical to parse_texts by
 * construction (same run_parse), pinned by a differential test. */
static PyObject *py_parse_only(PyObject *self, PyObject *args) {
    Py_buffer in;
    if (!PyArg_ParseTuple(args, "y*", &in)) return NULL;
    if (in.len > INT32_MAX / 2) {
        PyBuffer_Release(&in);
        Py_RETURN_NONE;
    }
    ctx_t c; int rc;
    if (run_parse(&in, &c, &rc) != 0) { free_ctx(&c); return NULL; }
    PyObject *result = NULL;
    if (rc != 0 && c.err_code == E_NOMEM) { PyErr_NoMemory(); goto done; }
    if (rc == 0) {
        result = Py_BuildValue(
            "(iiLLLLL)", 1, 0, (long long)0,
            (long long)(c.kind.n - 1), (long long)c.a_ns.n,
            (long long)c.n_text, (long long)c.max_d);
    } else {
        result = Py_BuildValue(
            "(iiLLLLL)", 0, c.err_code, (long long)c.err_pos,
            (long long)0, (long long)0, (long long)0, (long long)0);
    }
done:
    free_ctx(&c);
    return result;
}

static PyObject *py_parse(PyObject *self, PyObject *args) {
    Py_buffer in;
    if (!PyArg_ParseTuple(args, "y*", &in)) return NULL;
    if (in.len > INT32_MAX / 2) {
        /* caller falls back to the pure-Python kernel for giant docs */
        PyBuffer_Release(&in);
        Py_RETURN_NONE;
    }

    ctx_t c; int rc;
    if (run_parse(&in, &c, &rc) != 0) { free_ctx(&c); return NULL; }
    PyObject *result = NULL;
    if (rc != 0 && c.err_code == E_NOMEM) { PyErr_NoMemory(); goto done; }

    PyObject *buf_obj = PyBytes_FromStringAndSize((const char *)c.buf, c.size);
    if (!buf_obj) goto done;
    PyObject *text = Py_None, *mtext = Py_None;
    Py_INCREF(Py_None); Py_INCREF(Py_None);
    if (rc == 0) {
        Py_DECREF(Py_None); Py_DECREF(Py_None);
        if (extract_texts(&c, &text, &mtext) != 0) { Py_DECREF(buf_obj); goto done; }
    }
    PyObject *ld_obj;
    if (rc == 0) {
        ld_obj = compute_last_desc(&c);
        if (!ld_obj) { Py_DECREF(buf_obj); Py_DECREF(text); Py_DECREF(mtext); goto done; }
    } else {
        ld_obj = PyBytes_FromStringAndSize(NULL, 0);
        if (!ld_obj) { Py_DECREF(buf_obj); Py_DECREF(text); Py_DECREF(mtext); goto done; }
    }

    result = Py_BuildValue(
        "(iiL(LLLL)NNNNNNNNNNNNNNNNLLNN)",
        rc == 0 ? 1 : 0,
        c.err_code,
        (long long)c.err_pos,
        (long long)c.aux[0], (long long)c.aux[1],
        (long long)c.aux[2], (long long)c.aux[3],
        buf_obj,
        iv_to_bytes(&c.parent), iv_to_bytes(&c.prev_sib), iv_to_bytes(&c.next_sib),
        iv_to_bytes(&c.first_child), iv_to_bytes(&c.kind),
        iv_to_bytes(&c.loc_s), iv_to_bytes(&c.loc_e),
        iv_to_bytes(&c.at_s), iv_to_bytes(&c.at_e),
        iv_to_bytes(&c.a_ns), iv_to_bytes(&c.a_ne),
        iv_to_bytes(&c.a_vs), iv_to_bytes(&c.a_ve),
        text, mtext,
        (long long)c.n_text, (long long)c.max_d,
        iv_to_bytes(&c.depth), ld_obj);

done:
    free_ctx(&c);
    return result;
}

static PyMethodDef methods[] = {
    {"parse", py_parse, METH_VARARGS,
     "parse(xml: bytes) -> packed-array DOM tuple (see kernel/parser.py)"},
    {"parse_texts", py_parse_texts, METH_VARARGS,
     "parse_texts(xml: bytes) -> texts-only tuple (no node-array marshal)"},
    {"parse_only", py_parse_only, METH_VARARGS,
     "parse_only(xml: bytes) -> (ok, err_code, err_pos, n_nodes, "
     "n_attrs, n_text, max_depth); bench probe, no extraction"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef module = {
    PyModuleDef_HEAD_INIT, "_xps_cparser", NULL, -1, methods,
};

PyMODINIT_FUNC PyInit__xps_cparser(void) {
#if defined(__GLIBC__)
    /* each parse mallocs ~3x the document (mutable buffer + 14 index
     * arrays) and frees it all on return; glibc then TRIMS the heap,
     * so the next parse re-faults every page -- measured as the
     * dominant cost on the 960 KB book fixture (gprofng: ~60% of wall
     * in kernel-zeroing/memset + brk, parse core only ~23%). Keeping
     * the top of the heap resident across calls removes the fault
     * storm; 64 MB covers the largest supported document (u32 cap)
     * with room for the index arrays. */
    mallopt(M_TRIM_THRESHOLD, 64 * 1024 * 1024);
    mallopt(M_MMAP_THRESHOLD, 64 * 1024 * 1024);
#endif
    return PyModule_Create(&module);
}
