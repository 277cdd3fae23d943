/* Clean-room minimal kseq-compatible FASTA/FASTQ reader.
 *
 * Written for lra_tpu's golden-parity harness so the reference lra
 * binary can be compiled without htslib (zero-egress image).  Provides
 * the subset of the kseq API the reference uses (Genome.h:122-137,
 * MMIndex.h:249-311, Input.h:21): KSEQ_INIT(type, readfn), kseq_init,
 * kseq_read (returns >=0 per record, -1 at EOF), kseq_destroy, and the
 * name/comment/seq/qual kstring fields.  Not a copy of klib kseq.
 */
#ifndef LRA_TPU_KSEQ_STUB_H
#define LRA_TPU_KSEQ_STUB_H

#include <stdlib.h>
#include <string.h>

#ifndef LRA_TPU_KSTRING_T
#define LRA_TPU_KSTRING_T
typedef struct { size_t l, m; char *s; } kstring_t;
#endif

#define LRA_KS_BUF 65536

#define KSEQ_INIT(type_t, readfn)                                          \
  typedef struct {                                                         \
    kstring_t name, comment, seq, qual;                                    \
    int last_char;                                                         \
    type_t f;                                                              \
    unsigned char *buf;                                                    \
    int begin, end, is_eof;                                                \
  } kseq_t;                                                                \
  static inline kseq_t *kseq_init(type_t fd) {                             \
    kseq_t *s = (kseq_t *)calloc(1, sizeof(kseq_t));                       \
    s->f = fd;                                                             \
    s->buf = (unsigned char *)malloc(LRA_KS_BUF);                          \
    return s;                                                              \
  }                                                                        \
  static inline void kseq_destroy(kseq_t *ks) {                            \
    if (!ks) return;                                                       \
    free(ks->name.s); free(ks->comment.s);                                 \
    free(ks->seq.s); free(ks->qual.s);                                     \
    free(ks->buf); free(ks);                                               \
  }                                                                        \
  static inline int lra_ks_getc_(kseq_t *ks) {                             \
    if (ks->begin >= ks->end) {                                            \
      if (ks->is_eof) return -1;                                           \
      ks->begin = 0;                                                       \
      ks->end = readfn(ks->f, ks->buf, LRA_KS_BUF);                        \
      if (ks->end <= 0) { ks->is_eof = 1; return -1; }                     \
    }                                                                      \
    return ks->buf[ks->begin++];                                           \
  }                                                                        \
  static inline void lra_ks_reset_(kstring_t *str) {                       \
    if (!str->s) { str->m = 256; str->s = (char *)malloc(256); }           \
    str->l = 0; str->s[0] = 0;                                             \
  }                                                                        \
  static inline void lra_ks_push_(kstring_t *str, char c) {                \
    if (str->l + 2 >= str->m) {                                            \
      str->m = str->m ? str->m << 1 : 256;                                 \
      str->s = (char *)realloc(str->s, str->m);                            \
    }                                                                      \
    str->s[str->l++] = c; str->s[str->l] = 0;                              \
  }                                                                        \
  static inline int kseq_read(kseq_t *ks) {                                \
    int c;                                                                 \
    if (ks->last_char == 0) {                                              \
      while ((c = lra_ks_getc_(ks)) != -1 && c != '>' && c != '@') {}      \
      if (c == -1) return -1;                                              \
      ks->last_char = c;                                                   \
    }                                                                      \
    lra_ks_reset_(&ks->name); lra_ks_reset_(&ks->comment);                 \
    lra_ks_reset_(&ks->seq); lra_ks_reset_(&ks->qual);                     \
    while ((c = lra_ks_getc_(ks)) != -1 && c != ' ' && c != '\t' &&        \
           c != '\n' && c != '\r')                                         \
      lra_ks_push_(&ks->name, (char)c);                                    \
    while (c != -1 && c != '\n')                                           \
      { if (c != '\r' && c != ' ' && c != '\t')                            \
          lra_ks_push_(&ks->comment, (char)c);                             \
        c = lra_ks_getc_(ks); }                                            \
    while ((c = lra_ks_getc_(ks)) != -1 && c != '>' && c != '+' &&         \
           c != '@') {                                                     \
      if (c != '\n' && c != '\r') lra_ks_push_(&ks->seq, (char)c);         \
    }                                                                      \
    if (c == '>' || c == '@') { ks->last_char = c; return (int)ks->seq.l; }\
    if (c == '+') {                                                        \
      while ((c = lra_ks_getc_(ks)) != -1 && c != '\n') {}                 \
      while (ks->qual.l < ks->seq.l &&                                     \
             (c = lra_ks_getc_(ks)) != -1) {                               \
        if (c != '\n' && c != '\r') lra_ks_push_(&ks->qual, (char)c);      \
      }                                                                    \
      ks->last_char = 0;                                                   \
      return (int)ks->seq.l;                                               \
    }                                                                      \
    ks->last_char = 0;                                                     \
    return (int)ks->seq.l;                                                 \
  }

#endif  /* LRA_TPU_KSEQ_STUB_H */
