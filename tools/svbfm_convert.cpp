// svbfm_convert — libFM text -> binary sparse matrix (.x) + target (.y).
//
// Byte-compatible with the reference binary formats so files interchange
// with its convert/transpose tools (/root/reference/src/libfm/tools/
// convert.cpp and src/util/fmatrix.h:46-108, matrix.h:280-328):
//
//   .x: header {u32 id=2, u32 float_size=4, u64 num_values, u32 num_rows,
//       u32 num_cols}, then per row: u32 size + size * {u32 id, f32 value}
//   .y: {u32 id=1, u32 float_size=4, u32 dim}, then dim f32 values
//
// Two passes: count rows/nnz/max-feature, then stream rows out.  Usage:
//   svbfm_convert -ifile in.libfm -ofilex out.x -ofiley out.y

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Args {
    std::string ifile, ofilex, ofiley;
};

bool parse_args(int argc, char **argv, Args &a) {
    for (int i = 1; i < argc - 1; i += 2) {
        std::string k = argv[i];
        if (k == "-ifile") a.ifile = argv[i + 1];
        else if (k == "-ofilex") a.ofilex = argv[i + 1];
        else if (k == "-ofiley") a.ofiley = argv[i + 1];
        else return false;
    }
    return !a.ifile.empty() && !a.ofilex.empty() && !a.ofiley.empty();
}

const char *skip_ws(const char *p) {
    while (*p == ' ' || *p == '\t') p++;
    return p;
}

struct LineParser {
    // parses "<target> <id>:<val> ..." lines; comment/blank lines skipped
    static bool parse(const char *p, float *target,
                      std::vector<std::pair<uint32_t, float>> *entries) {
        p = skip_ws(p);
        if (*p == 0 || *p == '\n' || *p == '\r' || *p == '#') return false;
        char *end;
        *target = strtof(p, &end);
        if (end == p) return false;
        p = end;
        if (entries) entries->clear();
        for (;;) {
            p = skip_ws(p);
            if (*p == 0 || *p == '\n' || *p == '\r' || *p == '#') break;
            unsigned long fid = strtoul(p, &end, 10);
            if (end == p || *end != ':') return false;
            p = end + 1;
            float x = strtof(p, &end);
            if (end == p) return false;
            p = end;
            if (entries) entries->emplace_back((uint32_t)fid, x);
        }
        return true;
    }
};

}  // namespace

int main(int argc, char **argv) {
    Args a;
    if (!parse_args(argc, argv, a)) {
        std::fprintf(stderr,
                     "usage: svbfm_convert -ifile <libfm-text> -ofilex <out.x> "
                     "-ofiley <out.y>\n");
        return 2;
    }

    // pass 1: counts
    uint64_t num_values = 0;
    uint32_t num_rows = 0, num_cols = 0;
    {
        FILE *f = std::fopen(a.ifile.c_str(), "r");
        if (!f) { std::perror("ifile"); return 1; }
        std::vector<char> line(1 << 20);
        std::vector<std::pair<uint32_t, float>> ents;
        float target;
        while (std::fgets(line.data(), (int)line.size(), f)) {
            if (!LineParser::parse(line.data(), &target, &ents)) continue;
            num_rows++;
            num_values += ents.size();
            for (auto &e : ents)
                if (e.first + 1 > num_cols) num_cols = e.first + 1;
        }
        std::fclose(f);
    }
    std::printf("num_rows=%u\tnum_values=%llu\tnum_features=%u\n", num_rows,
                (unsigned long long)num_values, num_cols);

    // pass 2: stream out
    FILE *f = std::fopen(a.ifile.c_str(), "r");
    FILE *fx = std::fopen(a.ofilex.c_str(), "wb");
    FILE *fy = std::fopen(a.ofiley.c_str(), "wb");
    if (!f || !fx || !fy) { std::perror("open"); return 1; }

    // .x header (fmatrix.h file_header layout, 24 bytes)
    uint32_t hdr32[2] = {2u, 4u};
    std::fwrite(hdr32, 4, 2, fx);
    std::fwrite(&num_values, 8, 1, fx);
    std::fwrite(&num_rows, 4, 1, fx);
    std::fwrite(&num_cols, 4, 1, fx);
    // .y header (matrix.h DVector<float> saveToBinaryFile)
    uint32_t yhdr[3] = {1u, 4u, num_rows};
    std::fwrite(yhdr, 4, 3, fy);

    std::vector<char> line(1 << 20);
    std::vector<std::pair<uint32_t, float>> ents;
    float target;
    while (std::fgets(line.data(), (int)line.size(), f)) {
        if (!LineParser::parse(line.data(), &target, &ents)) continue;
        std::fwrite(&target, 4, 1, fy);
        uint32_t size = (uint32_t)ents.size();
        std::fwrite(&size, 4, 1, fx);
        for (auto &e : ents) {
            std::fwrite(&e.first, 4, 1, fx);
            std::fwrite(&e.second, 4, 1, fx);
        }
    }
    std::fclose(f);
    std::fclose(fx);
    std::fclose(fy);
    return 0;
}
