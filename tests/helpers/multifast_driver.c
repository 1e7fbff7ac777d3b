/* Conformance-oracle driver: drives the UNMODIFIED upstream MultiFast
 * sources (compiled out-of-tree from /root/reference/src/multifast — never
 * vendored into this repo) so the framework's match and replace semantics
 * can be fuzz-checked byte-for-byte against the real reference
 * implementation (`ac_trie_search`, `multifast_replace`).
 *
 * Protocol (all integers little-endian uint32, lengths in bytes):
 *
 *   stdin:
 *     u32 n_patterns
 *       n_patterns x { u32 plen; u8 p[plen]; u32 rlen; u8 r[rlen] }
 *           rlen == 0xFFFFFFFF means "no replacement text" (search-only
 *           pattern; reference glue does this for every pattern,
 *           php_ahocorasick.c:467-470)
 *     u32 mode            0 = search, 1 = replace NORMAL, 2 = replace LAZY
 *     u32 keep            search: keep state across chunks (keep=1 analog)
 *     u32 n_chunks
 *       n_chunks x { u32 clen; u8 c[clen] }
 *
 *   stdout:
 *     mode 0: one line per (match, pattern):  "M <end_position> <pattern#>\n"
 *             where end_position = reference position (exclusive byte end,
 *             global across kept chunks) and pattern# = the 0-based index
 *             the pattern was added with (carried via AC_PATTID number).
 *             Per-pattern add status lines first: "S <idx> <status>\n".
 *     mode 1/2: "R <total_output_len>\n" then the raw replaced bytes
 *             (callback chunks concatenated + final flush).
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "ahocorasick.h"

static unsigned int rd_u32(void) {
    unsigned char b[4];
    if (fread(b, 1, 4, stdin) != 4) { fprintf(stderr, "short read\n"); exit(2); }
    return (unsigned int)b[0] | ((unsigned int)b[1] << 8) |
           ((unsigned int)b[2] << 16) | ((unsigned int)b[3] << 24);
}

static char *rd_bytes(unsigned int n) {
    char *p = (char *)malloc(n ? n : 1);
    if (n && fread(p, 1, n, stdin) != n) { fprintf(stderr, "short read\n"); exit(2); }
    return p;
}

static int match_cb(AC_MATCH_t *m, void *user) {
    (void)user;
    for (size_t i = 0; i < m->size; i++)
        printf("M %zu %ld\n", m->position, m->patterns[i].id.u.number);
    return 0;
}

struct outbuf { char *p; size_t len, cap; };

static void rep_cb(AC_TEXT_t *t, void *user) {
    struct outbuf *ob = (struct outbuf *)user;
    if (ob->len + t->length > ob->cap) {
        ob->cap = (ob->len + t->length) * 2 + 64;
        ob->p = (char *)realloc(ob->p, ob->cap);
    }
    memcpy(ob->p + ob->len, t->astring, t->length);
    ob->len += t->length;
}

int main(void) {
    unsigned int np = rd_u32();
    AC_TRIE_t *trie = ac_trie_create();
    for (unsigned int i = 0; i < np; i++) {
        unsigned int plen = rd_u32();
        char *p = rd_bytes(plen);
        unsigned int rlen = rd_u32();
        char *r = NULL;
        AC_PATTERN_t patt;
        memset(&patt, 0, sizeof patt);
        patt.ptext.astring = p;
        patt.ptext.length = plen;
        if (rlen != 0xFFFFFFFFu) {
            r = rd_bytes(rlen);
            patt.rtext.astring = r;
            patt.rtext.length = rlen;
        } else {
            patt.rtext.astring = NULL;
            patt.rtext.length = 0;
        }
        patt.id.u.number = (long)i;
        patt.id.type = AC_PATTID_TYPE_NUMBER;
        patt.aux = NULL;
        /* copy=0 (buffers stay alive for the process lifetime): copy=1
         * routes ptext/rtext through mpool_strndup, whose strncpy
         * zero-pads everything after an embedded NUL byte — breaking the
         * library's own binary-safety contract (actypes.h:47 "text can
         * contain zero value alphabets").  The PHP glue never passes
         * rtext, so upstream never sees it; we test engine semantics. */
        printf("S %u %d\n", i, (int)ac_trie_add(trie, &patt, 0));
    }
    unsigned int mode = rd_u32();
    unsigned int keep = rd_u32();
    unsigned int nc = rd_u32();
    ac_trie_finalize(trie);

    if (mode == 0) {
        for (unsigned int c = 0; c < nc; c++) {
            unsigned int clen = rd_u32();
            char *buf = rd_bytes(clen);
            AC_TEXT_t text = { buf, clen };
            ac_trie_search(trie, &text, (int)(keep && c > 0), match_cb, NULL);
            free(buf);
        }
    } else {
        struct outbuf ob = { NULL, 0, 0 };
        MF_REPLACE_MODE_t rm = (mode == 1) ? MF_REPLACE_MODE_NORMAL
                                           : MF_REPLACE_MODE_LAZY;
        for (unsigned int c = 0; c < nc; c++) {
            unsigned int clen = rd_u32();
            char *buf = rd_bytes(clen);
            AC_TEXT_t text = { buf, clen };
            int rc = multifast_replace(trie, &text, rm, rep_cb, &ob);
            if (rc != 0) { fprintf(stderr, "replace rc=%d\n", rc); exit(3); }
            free(buf);
        }
        multifast_rep_flush(trie, 0);
        printf("R %zu\n", ob.len);
        fflush(stdout);
        fwrite(ob.p, 1, ob.len, stdout);
        free(ob.p);
    }
    ac_trie_release(trie);
    return 0;
}
