/* Minimal htslib stand-in: lets the reference's (unreached for
 * FASTA/FASTQ input) BAM code paths COMPILE.  Opening BAM input through
 * these stubs yields an immediate EOF. */
#ifndef LRA_TPU_HTS_STUB_H
#define LRA_TPU_HTS_STUB_H

#include <stdint.h>
#include <stdlib.h>

enum htsExactFormat { unknown_format = 0, sam = 1, bam = 2, cram = 3 };
typedef struct { enum htsExactFormat format; } htsFormat;
typedef struct { htsFormat fmt; } htsFile;

static inline htsFile *hts_open(const char *fn, const char *mode) {
  (void)fn; (void)mode;
  return (htsFile *)calloc(1, sizeof(htsFile));
}
static inline const htsFormat *hts_get_format(htsFile *f) { return &f->fmt; }
static inline const char *hts_format_file_extension(const htsFormat *f) {
  (void)f; return "unknown";
}
static inline int hts_close(htsFile *f) { free(f); return 0; }

#endif
