/* Minimal sam.h stand-in (see hts.h). */
#ifndef LRA_TPU_SAM_STUB_H
#define LRA_TPU_SAM_STUB_H

#include <stdint.h>
#include <stdlib.h>
#include "hts.h"

#ifndef LRA_TPU_KSTRING_T
#define LRA_TPU_KSTRING_T
typedef struct { size_t l, m; char *s; } kstring_t;
#endif

typedef struct {
  int32_t n_targets;
  char **target_name;
  uint32_t *target_len;
  char *text;
} bam_hdr_t;

typedef struct {
  int32_t l_qseq;
  uint16_t flag;
} bam1_core_t;

typedef struct {
  bam1_core_t core;
  uint8_t *data;
} bam1_t;

static inline bam_hdr_t *sam_hdr_read(htsFile *f) {
  (void)f;
  return (bam_hdr_t *)calloc(1, sizeof(bam_hdr_t));
}
static inline void bam_hdr_destroy(bam_hdr_t *h) { free(h); }
static inline bam1_t *bam_init1(void) {
  return (bam1_t *)calloc(1, sizeof(bam1_t));
}
static inline void bam_destroy1(bam1_t *b) { free(b); }
static inline int sam_read1(htsFile *f, bam_hdr_t *h, bam1_t *b) {
  (void)f; (void)h; (void)b;
  return -1;  /* immediate EOF: BAM input unsupported in the stub build */
}
#define bam_get_qname(b) ((char *)"")
#define bam_get_seq(b) ((uint8_t *)0)
#define bam_get_qual(b) ((char *)"")
#define bam_get_aux(b) ((uint8_t *)0)
#define bam_seqi(s, i) (0)
static const char seq_nt16_str[] = "=ACMGRSVTWYHKDBN";
static inline int sam_format1(const bam_hdr_t *h, const bam1_t *b,
                              kstring_t *ks) {
  (void)h; (void)b; (void)ks;
  return -1;
}

#endif
