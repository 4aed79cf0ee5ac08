// svbfm_transpose — binary sparse matrix transpose with bounded memory.
//
// Reads a reference-format binary sparse matrix (.x, see svbfm_convert.cpp)
// and writes its transpose (.xt): same container format with rows and
// columns swapped.  Like the reference tool (/root/reference/src/libfm/
// tools/transpose.cpp:54-172) it makes multiple passes over the input,
// each pass materializing a window of output columns sized to a memory
// budget, so arbitrarily large matrices transpose in bounded RAM.
//
// Usage: svbfm_transpose -ifile in.x -ofile out.xt [-cache_size bytes]

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Header {
    uint32_t id, float_size;
    uint64_t num_values;
    uint32_t num_rows, num_cols;
};

bool read_header(FILE *f, Header &h) {
    return std::fread(&h.id, 4, 1, f) == 1 &&
           std::fread(&h.float_size, 4, 1, f) == 1 &&
           std::fread(&h.num_values, 8, 1, f) == 1 &&
           std::fread(&h.num_rows, 4, 1, f) == 1 &&
           std::fread(&h.num_cols, 4, 1, f) == 1;
}

void write_header(FILE *f, const Header &h) {
    std::fwrite(&h.id, 4, 1, f);
    std::fwrite(&h.float_size, 4, 1, f);
    std::fwrite(&h.num_values, 8, 1, f);
    std::fwrite(&h.num_rows, 4, 1, f);
    std::fwrite(&h.num_cols, 4, 1, f);
}

struct Entry {
    uint32_t id;
    float value;
};

}  // namespace

int main(int argc, char **argv) {
    std::string ifile, ofile;
    uint64_t cache_bytes = 200ull << 20;
    for (int i = 1; i < argc - 1; i += 2) {
        std::string k = argv[i];
        if (k == "-ifile") ifile = argv[i + 1];
        else if (k == "-ofile") ofile = argv[i + 1];
        else if (k == "-cache_size") cache_bytes = std::strtoull(argv[i + 1], nullptr, 10);
        else {
            std::fprintf(stderr, "unknown flag %s\n", k.c_str());
            return 2;
        }
    }
    if (ifile.empty() || ofile.empty()) {
        std::fprintf(stderr,
                     "usage: svbfm_transpose -ifile in.x -ofile out.xt "
                     "[-cache_size bytes]\n");
        return 2;
    }

    FILE *fin = std::fopen(ifile.c_str(), "rb");
    if (!fin) { std::perror("ifile"); return 1; }
    Header h;
    if (!read_header(fin, h) || h.id != 2 || h.float_size != 4) {
        std::fprintf(stderr, "bad input header\n");
        return 1;
    }

    // pass 0: per-column counts
    std::vector<uint64_t> col_cnt(h.num_cols, 0);
    {
        std::vector<Entry> buf;
        uint32_t size;
        for (uint32_t r = 0; r < h.num_rows; r++) {
            if (std::fread(&size, 4, 1, fin) != 1) return 1;
            buf.resize(size);
            if (size && std::fread(buf.data(), sizeof(Entry), size, fin) != size)
                return 1;
            for (uint32_t k = 0; k < size; k++) col_cnt[buf[k].id]++;
        }
    }

    FILE *fout = std::fopen(ofile.c_str(), "wb");
    if (!fout) { std::perror("ofile"); return 1; }
    Header ho = h;
    ho.num_rows = h.num_cols;
    ho.num_cols = h.num_rows;
    write_header(fout, ho);

    // window passes: output columns [lo, hi) whose entries fit the budget
    uint32_t lo = 0;
    std::vector<Entry> window;
    std::vector<uint64_t> offs;
    std::vector<Entry> buf;
    while (lo < h.num_cols) {
        uint64_t bytes = 0;
        uint32_t hi = lo;
        while (hi < h.num_cols) {
            uint64_t b = col_cnt[hi] * sizeof(Entry);
            if (hi > lo && bytes + b > cache_bytes) break;
            bytes += b;
            hi++;
        }
        // gather entries for columns [lo, hi)
        offs.assign(hi - lo + 1, 0);
        for (uint32_t c = lo; c < hi; c++) offs[c - lo + 1] = offs[c - lo] + col_cnt[c];
        window.resize(offs[hi - lo]);
        std::vector<uint64_t> fill(offs.begin(), offs.end() - 1);

        std::fseek(fin, 24, SEEK_SET);
        uint32_t size;
        for (uint32_t r = 0; r < h.num_rows; r++) {
            if (std::fread(&size, 4, 1, fin) != 1) return 1;
            buf.resize(size);
            if (size && std::fread(buf.data(), sizeof(Entry), size, fin) != size)
                return 1;
            for (uint32_t k = 0; k < size; k++) {
                uint32_t c = buf[k].id;
                if (c >= lo && c < hi) {
                    window[fill[c - lo]].id = r;
                    window[fill[c - lo]].value = buf[k].value;
                    fill[c - lo]++;
                }
            }
        }
        for (uint32_t c = lo; c < hi; c++) {
            uint32_t size_out = (uint32_t)col_cnt[c];
            std::fwrite(&size_out, 4, 1, fout);
            std::fwrite(window.data() + offs[c - lo], sizeof(Entry), size_out,
                        fout);
        }
        lo = hi;
    }
    std::fclose(fin);
    std::fclose(fout);
    return 0;
}
