// Native host-side runtime for rakau_tpu.
//
// TPU-native counterpart of the reference's compiled support layers:
// libmorton-style bit-interleaving (SURVEY.md C1), TBB-parallel-sort
// analog (C3, here an OpenMP LSD radix sort), and the O(N^2) fp64
// direct-sum oracle (C10) used for accuracy gates at particle counts
// where a NumPy oracle is too slow. Exposed as a C ABI consumed via
// ctypes (no pybind11 in this environment).
//
// Build: see native/build.sh (g++ -O3 -march=native -fopenmp -shared).
#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// ---------------------------------------------------------------- morton
// Spread the low `depth` bits of v so bit b lands at position b*ndim.
static inline uint64_t spread_bits(uint64_t v, int ndim, int depth) {
    uint64_t r = 0;
    for (int b = 0; b < depth; ++b)
        r |= ((v >> b) & 1ull) << (b * ndim);
    return r;
}

// cells: [n, ndim] uint32 -> codes [n] uint64 (dimension 0 most
// significant within each bit group; matches rakau_tpu.morton).
void morton_encode(int64_t n, int ndim, int depth, const uint32_t* cells,
                   uint64_t* codes) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
        uint64_t c = 0;
        for (int d = 0; d < ndim; ++d)
            c |= spread_bits(cells[i * ndim + d], ndim, depth)
                 << (ndim - 1 - d);
        codes[i] = c;
    }
}

void morton_decode(int64_t n, int ndim, int depth, const uint64_t* codes,
                   uint32_t* cells) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
        for (int d = 0; d < ndim; ++d) {
            uint64_t v = 0;
            for (int b = 0; b < depth; ++b) {
                int p = b * ndim + (ndim - 1 - d);
                v |= ((codes[i] >> p) & 1ull) << b;
            }
            cells[i * ndim + d] = (uint32_t)v;
        }
    }
}

// ------------------------------------------------------------ radix sort
// Indirect LSD radix sort of 64-bit keys, 8 bits per pass; writes the
// sorting permutation into perm (int64). Fully parallel: per-chunk
// histograms, bucket-major exclusive prefix across chunks, then a
// parallel stable scatter (each chunk owns disjoint output slots).
void radix_argsort_u64(int64_t n, const uint64_t* keys, int64_t* perm) {
    std::vector<int64_t> idx(n), tmp(n);
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) idx[i] = i;
    std::vector<uint64_t> k(keys, keys + n), ktmp(n);

    int nthreads = 1;
#ifdef _OPENMP
    nthreads = omp_get_max_threads();
#endif
    const int64_t chunk = (n + nthreads - 1) / nthreads;
    std::vector<int64_t> hist(static_cast<size_t>(nthreads) * 256);

    for (int pass = 0; pass < 8; ++pass) {
        const int shift = pass * 8;
        std::fill(hist.begin(), hist.end(), 0);
#pragma omp parallel for schedule(static)
        for (int t = 0; t < nthreads; ++t) {
            const int64_t lo = t * chunk;
            const int64_t hi = std::min(n, lo + chunk);
            int64_t* h = hist.data() + static_cast<size_t>(t) * 256;
            for (int64_t i = lo; i < hi; ++i)
                ++h[(k[i] >> shift) & 0xff];
        }
        // exclusive prefix in (bucket, chunk) order preserves stability
        int64_t sum = 0;
        for (int b = 0; b < 256; ++b) {
            for (int t = 0; t < nthreads; ++t) {
                int64_t& h = hist[static_cast<size_t>(t) * 256 + b];
                const int64_t v = h;
                h = sum;
                sum += v;
            }
        }
#pragma omp parallel for schedule(static)
        for (int t = 0; t < nthreads; ++t) {
            const int64_t lo = t * chunk;
            const int64_t hi = std::min(n, lo + chunk);
            int64_t* h = hist.data() + static_cast<size_t>(t) * 256;
            for (int64_t i = lo; i < hi; ++i) {
                const int b = (k[i] >> shift) & 0xff;
                ktmp[h[b]] = k[i];
                tmp[h[b]] = idx[i];
                ++h[b];
            }
        }
        k.swap(ktmp);
        idx.swap(tmp);
    }
    std::memcpy(perm, idx.data(), n * sizeof(int64_t));
}

// ----------------------------------------------------------- direct sum
// Exact softened accelerations+potentials for a subset of targets, fp64.
//   acc_i = G sum_j m_j (x_j - x_i) / (r^2 + eps^2)^{3/2}
//   pot_i = -G sum_j m_j / (r^2 + eps^2)^{1/2},  self term excluded.
void direct_acc_pot(int64_t n, int ndim, const double* pos,
                    const double* mass, double eps, double G,
                    int64_t n_targets, const int64_t* targets,
                    double* acc, double* pot) {
    const double e2 = eps * eps;
#pragma omp parallel for schedule(dynamic, 16)
    for (int64_t t = 0; t < n_targets; ++t) {
        const int64_t i = targets ? targets[t] : t;
        double ax[3] = {0, 0, 0};
        double p = 0;
        const double* xi = pos + i * ndim;
        for (int64_t j = 0; j < n; ++j) {
            if (j == i) continue;
            const double* xj = pos + j * ndim;
            double r2 = e2;
            double dx[3];
            for (int d = 0; d < ndim; ++d) {
                dx[d] = xj[d] - xi[d];
                r2 += dx[d] * dx[d];
            }
            if (r2 <= 0) continue;
            const double inv = 1.0 / std::sqrt(r2);
            const double w = mass[j] * inv;
            const double w3 = w * inv * inv;
            p -= w;
            for (int d = 0; d < ndim; ++d) ax[d] += w3 * dx[d];
        }
        for (int d = 0; d < ndim; ++d) acc[t * ndim + d] = G * ax[d];
        pot[t] = G * p;
    }
}

int native_num_threads() {
#ifdef _OPENMP
    return omp_get_max_threads();
#else
    return 1;
#endif
}

}  // extern "C"
