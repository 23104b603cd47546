// Native CSV feature-table writer.
//
// Equivalent role to the reference's CSV output stage
// (reference: src/nyx/output_2_csv.cpp save_features_2_csv): streams rows of
// (string prefix columns + double feature values) to disk without Python
// string formatting overhead. Values are printed with repr-faithful %.10g
// (matching the reference's default precision) and the caller-provided
// NAN/unassigned substitution text.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>

extern "C" {

// Write (or append to) a CSV file.
//   path:        output file
//   header:      full header line without trailing newline (NULL = no header)
//   row_prefixes: nrows C strings, each the pre-rendered string-column prefix
//                (e.g. "mask.tif,intens.tif,17") WITHOUT trailing comma
//   values:      row-major [nrows, ncols] doubles
//   noval_text:  text substituted for unassigned (-0.0) / NaN cells
//   append:      1 = append (no header rewrite), 0 = truncate
//   precision:   significant digits ("%.<precision>g"; the reference's CSV
//                stage prints "%g" = 6, output_2_csv.cpp:225)
// Returns 0 on success.
//   sub_negzero: 1 = treat -0.0 as the unassigned sentinel too
int nyxcsv_write(const char* path, const char* header,
                 const char** row_prefixes, const double* values,
                 int64_t nrows, int64_t ncols, const char* noval_text,
                 int append, int precision, int sub_negzero) {
    char fmt[16];
    std::snprintf(fmt, sizeof fmt, "%%.%dg", precision > 0 ? precision : 6);
    FILE* f = std::fopen(path, append ? "ab" : "wb");
    if (!f) return -1;
    if (header && !append) {
        std::fputs(header, f);
        std::fputc('\n', f);
    }
    char buf[64];
    for (int64_t r = 0; r < nrows; r++) {
        if (row_prefixes && row_prefixes[r]) std::fputs(row_prefixes[r], f);
        const double* row = values + r * ncols;
        for (int64_t c = 0; c < ncols; c++) {
            std::fputc(',', f);
            double v = row[c];
            // unassigned sentinel: negative zero (roi_cache.h:17) or NaN
            if (std::isnan(v) ||
                (sub_negzero && v == 0.0 && std::signbit(v))) {
                std::fputs(noval_text, f);
            } else {
                int n = std::snprintf(buf, sizeof buf, fmt, v);
                std::fwrite(buf, 1, (size_t)n, f);
            }
        }
        std::fputc('\n', f);
    }
    std::fclose(f);
    return 0;
}

}  // extern "C"
