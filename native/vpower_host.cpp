// vpower_host — native host-side runtime for vpower-tpu.
//
// The reference delegated its host-side heavy lifting to native
// libraries (ANN/Annoy kd-trees with a persisted mmap index, FFTW
// plans, MPI buffers — SURVEY.md §2.3).  The TPU rebuild moves the
// compute to XLA/Pallas; what remains host-side is DATA LOGISTICS,
// implemented here:
//
//   * a Gadget-2 legacy binary snapshot reader (SnapFormat 1 and 2) —
//     the non-HDF5 sibling of the reference's h5py path
//     (vpower/interp.py:84-131); many production snapshots ship in
//     this format and no Python HDF5 stack is needed for it;
//   * Morton (Z-order) key computation + parallel permutation sort —
//     the spatial pre-ordering that plays the role of the reference's
//     persisted Annoy index (parallel_optimized.py:297-313): sorting
//     particles once on the host makes every later device-side
//     cell-sort start from a nearly-sorted order and makes brick
//     selection contiguous;
//   * a threaded raw-brick reader/writer with posix I/O — the disk
//     streaming layer under BrickStore (vpower/interp.py:858-879
//     replacement), so folds can overlap disk reads with device
//     compute.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).
// Build: make -C native   (g++ -O3 -march=native -fopenmp -shared)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <string>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// ---------------------------------------------------------------------
// Gadget-2 legacy binary reader
// ---------------------------------------------------------------------
// Gadget block structure: [int32 len][payload][int32 len].  SnapFormat 2
// prefixes each block with a 4-char tag block.  Header: 6x uint32 npart,
// 6x double mass table, double time, double redshift, ... (256 bytes).

struct GadgetHeader {
  uint32_t npart[6];
  double mass[6];
  double time;
  double redshift;
  int32_t flag_sfr;
  int32_t flag_feedback;
  uint32_t npart_total[6];
  int32_t flag_cooling;
  int32_t num_files;
  double box_size;
  double omega0;
  double omega_lambda;
  double hubble_param;
  char fill[96];
};

static bool read_block_header(FILE* f, int snap_format, char expect_tag[5],
                              uint32_t* payload_len) {
  if (snap_format == 2) {
    uint32_t l1, l2;
    char tag[4];
    if (fread(&l1, 4, 1, f) != 1) return false;
    if (fread(tag, 1, 4, f) != 4) return false;
    uint32_t next_len;
    if (fread(&next_len, 4, 1, f) != 1) return false;
    if (fread(&l2, 4, 1, f) != 1) return false;
    std::memcpy(expect_tag, tag, 4);
    expect_tag[4] = 0;
    (void)next_len;
  } else {
    expect_tag[0] = 0;
  }
  uint32_t l1;
  if (fread(&l1, 4, 1, f) != 1) return false;
  *payload_len = l1;
  return true;
}

static bool skip_block_footer(FILE* f) {
  uint32_t l2;
  return fread(&l2, 4, 1, f) == 1;
}

// Returns the gas particle count, or -1 on error.  Arrays must be
// pre-sized by a first call with null pointers (query mode).
long long read_gadget_binary(const char* path, int snap_format,
                             float* pos, float* vel, float* mass,
                             float* rho, double* box_size) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;

  char tag[5];
  uint32_t len;
  if (!read_block_header(f, snap_format, tag, &len) || len < 256) {
    fclose(f);
    return -1;
  }
  GadgetHeader h;
  std::memset(&h, 0, sizeof(h));
  size_t take = len < sizeof(h) ? len : sizeof(h);
  if (fread(&h, 1, take, f) != take) { fclose(f); return -1; }
  if (len > take) fseek(f, (long)(len - take), SEEK_CUR);
  skip_block_footer(f);
  if (box_size) *box_size = h.box_size;

  uint64_t n_gas = h.npart[0];
  uint64_t n_all = 0;
  for (int i = 0; i < 6; i++) n_all += h.npart[i];
  if (n_gas == 0) { fclose(f); return 0; }
  if (!pos) { fclose(f); return (long long)n_gas; }  // query mode

  // POS block: all particle types; take the first n_gas (type 0 first).
  if (!read_block_header(f, snap_format, tag, &len)) { fclose(f); return -1; }
  if (fread(pos, sizeof(float), 3 * n_gas, f) != 3 * n_gas) {
    fclose(f); return -1;
  }
  fseek(f, (long)(len - 3 * n_gas * 4), SEEK_CUR);
  skip_block_footer(f);

  // VEL block
  if (!read_block_header(f, snap_format, tag, &len)) { fclose(f); return -1; }
  if (fread(vel, sizeof(float), 3 * n_gas, f) != 3 * n_gas) {
    fclose(f); return -1;
  }
  fseek(f, (long)(len - 3 * n_gas * 4), SEEK_CUR);
  skip_block_footer(f);

  // ID block (skipped)
  if (!read_block_header(f, snap_format, tag, &len)) { fclose(f); return -1; }
  fseek(f, (long)len, SEEK_CUR);
  skip_block_footer(f);

  // MASS block: present only for types whose header mass is 0.
  uint64_t n_mass = 0;
  for (int i = 0; i < 6; i++)
    if (h.mass[i] == 0.0) n_mass += h.npart[i];
  if (n_mass > 0) {
    if (!read_block_header(f, snap_format, tag, &len)) { fclose(f); return -1; }
    if (h.mass[0] == 0.0) {
      if (fread(mass, sizeof(float), n_gas, f) != n_gas) {
        fclose(f); return -1;
      }
      fseek(f, (long)(len - n_gas * 4), SEEK_CUR);
    } else {
      for (uint64_t i = 0; i < n_gas; i++) mass[i] = (float)h.mass[0];
      fseek(f, (long)len, SEEK_CUR);
    }
    skip_block_footer(f);
  } else {
    for (uint64_t i = 0; i < n_gas; i++) mass[i] = (float)h.mass[0];
  }

  // U (internal energy, gas only) — skipped.
  if (read_block_header(f, snap_format, tag, &len)) {
    fseek(f, (long)len, SEEK_CUR);
    skip_block_footer(f);
    // RHO (gas density)
    if (read_block_header(f, snap_format, tag, &len) &&
        len >= n_gas * sizeof(float)) {
      if (fread(rho, sizeof(float), n_gas, f) != n_gas) {
        fclose(f); return -1;
      }
      fseek(f, (long)(len - n_gas * 4), SEEK_CUR);
      skip_block_footer(f);
    } else {
      for (uint64_t i = 0; i < n_gas; i++) rho[i] = 1.0f;
    }
  } else {
    for (uint64_t i = 0; i < n_gas; i++) rho[i] = 1.0f;
  }

  fclose(f);
  return (long long)n_gas;
}

// ---------------------------------------------------------------------
// Morton ordering
// ---------------------------------------------------------------------
static inline uint64_t expand_bits(uint64_t v) {
  // spread 21 bits across 63 (3-D interleave)
  v &= 0x1fffff;
  v = (v | v << 32) & 0x1f00000000ffffULL;
  v = (v | v << 16) & 0x1f0000ff0000ffULL;
  v = (v | v << 8)  & 0x100f00f00f00f00fULL;
  v = (v | v << 4)  & 0x10c30c30c30c30c3ULL;
  v = (v | v << 2)  & 0x1249249249249249ULL;
  return v;
}

// keys[i] = 63-bit Morton key of pos[i] scaled to the box.
void morton_keys(const float* pos, long long n, double box_size,
                 uint64_t* keys) {
  const double scale = 2097151.0 / box_size;  // 2^21 - 1
#pragma omp parallel for schedule(static)
  for (long long i = 0; i < n; i++) {
    double x = pos[3 * i + 0], y = pos[3 * i + 1], z = pos[3 * i + 2];
    x -= box_size * std::floor(x / box_size);
    y -= box_size * std::floor(y / box_size);
    z -= box_size * std::floor(z / box_size);
    uint64_t xi = (uint64_t)(x * scale);
    uint64_t yi = (uint64_t)(y * scale);
    uint64_t zi = (uint64_t)(z * scale);
    keys[i] = (expand_bits(xi) << 2) | (expand_bits(yi) << 1) | expand_bits(zi);
  }
}

// order[i] = index of the i-th particle in Morton order (parallel merge
// sort via gcc parallel mode when OpenMP is on; std::sort otherwise).
void morton_argsort(const float* pos, long long n, double box_size,
                    int64_t* order) {
  std::vector<uint64_t> keys((size_t)n);
  morton_keys(pos, n, box_size, keys.data());
#pragma omp parallel for schedule(static)
  for (long long i = 0; i < n; i++) order[i] = i;
  std::sort(order, order + n, [&](int64_t a, int64_t b) {
    return keys[(size_t)a] < keys[(size_t)b];
  });
}

// Apply a permutation to an (n, width) float array into out.
void permute_floats(const float* in, const int64_t* order, long long n,
                    int width, float* out) {
#pragma omp parallel for schedule(static)
  for (long long i = 0; i < n; i++) {
    const float* src = in + (size_t)order[i] * width;
    float* dst = out + (size_t)i * width;
    for (int c = 0; c < width; c++) dst[c] = src[c];
  }
}

// ---------------------------------------------------------------------
// Threaded raw-brick I/O
// ---------------------------------------------------------------------
// Bricks are raw float32 files; the prefetcher loads the NEXT brick on a
// worker thread while the device folds the current one.

struct BrickPrefetcher {
  std::thread worker;
  std::vector<float> buffer;
  std::atomic<int> status{0};  // 0 idle, 1 busy, 2 ready, -1 error
};

void* brick_prefetcher_create() { return new BrickPrefetcher(); }

void brick_prefetcher_destroy(void* p) {
  auto* bp = (BrickPrefetcher*)p;
  if (bp->worker.joinable()) bp->worker.join();
  delete bp;
}

int brick_prefetch_start(void* p, const char* path, long long n_floats) {
  auto* bp = (BrickPrefetcher*)p;
  if (bp->status.load() == 1) return -1;  // busy
  if (bp->worker.joinable()) bp->worker.join();
  bp->status.store(1);
  std::string path_s(path);
  bp->worker = std::thread([bp, path_s, n_floats]() {
    bp->buffer.resize((size_t)n_floats);
    FILE* f = fopen(path_s.c_str(), "rb");
    if (!f) { bp->status.store(-1); return; }
    size_t got = fread(bp->buffer.data(), sizeof(float), (size_t)n_floats, f);
    fclose(f);
    bp->status.store(got == (size_t)n_floats ? 2 : -1);
  });
  return 0;
}

// Blocks until the prefetched brick is ready, then copies it out.
int brick_prefetch_finish(void* p, float* out, long long n_floats) {
  auto* bp = (BrickPrefetcher*)p;
  if (bp->worker.joinable()) bp->worker.join();
  if (bp->status.load() != 2) return -1;
  std::memcpy(out, bp->buffer.data(), (size_t)n_floats * sizeof(float));
  bp->status.store(0);
  return 0;
}

int brick_write(const char* path, const float* data, long long n_floats) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  size_t put = fwrite(data, sizeof(float), (size_t)n_floats, f);
  fclose(f);
  return put == (size_t)n_floats ? 0 : -1;
}

int brick_read(const char* path, float* out, long long n_floats) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  size_t got = fread(out, sizeof(float), (size_t)n_floats, f);
  fclose(f);
  return got == (size_t)n_floats ? 0 : -1;
}

// ---------------------------------------------------------------------
// Streamed-pipeline block candidate runs (threaded counting sort)
// ---------------------------------------------------------------------
// Host-side builder for the distributed block-streamed folded pipeline
// (vpower_tpu/run/streamed.py:_block_candidates): sort particle rows
// [rel_xyz, vel, rho] into m^3 per-block runs, including every particle
// within margin_phys of a block (periodic images unwrapped into the
// block's extended open-box frame).  Counterpart of the reference's
// per-rank particle handling (scripts/parallel_optimized.py:272-313 —
// which replicated the FULL snapshot per rank instead).
//
// Two-call protocol: rows == NULL fills counts[m^3] and returns the
// total row count R; the second call (rows sized >= R rows of 7 floats)
// writes the block-sorted rows and starts[m^3].  OpenMP counting sort:
// per-thread block histograms -> exclusive prefix over (block, thread)
// -> each thread streams its contiguous particle range directly to
// final positions.  Row order within a run is (particle, image-combo)
// ascending for a fixed thread count — the same order as the numpy
// builder's stable argsort.

long long block_candidates(const float* pos, const float* vel,
                           const float* rho, long long n, int m,
                           double box, double margin_phys, float* rows,
                           long long* starts, long long* counts) {
  const int n_t = m * m * m;
  const double bs = box / m;
  const double ext = bs + 2.0 * margin_phys;
  if (ext > box * (1.0 + 1e-9) || n_t <= 0) return -1;

  int nthreads = 1;
#pragma omp parallel
  {
#pragma omp single
    nthreads = omp_get_num_threads();
  }
  // per-thread histograms: hist[t * n_t + b]
  std::vector<long long> hist((size_t)nthreads * n_t, 0);

  // pass 1: count rows per (thread, block)
#pragma omp parallel
  {
    const int t = omp_get_thread_num();
    long long* h = hist.data() + (size_t)t * n_t;
#pragma omp for schedule(static)
    for (long long i = 0; i < n; i++) {
      double y[3];
      int qh[3], na[3];
      for (int a = 0; a < 3; a++) {
        double p = std::fmod((double)pos[i * 3 + a], box);
        if (p < 0) p += box;
        y[a] = p + margin_phys;
        qh[a] = (int)std::floor(y[a] / bs);
        // round rel0 through float first — bit-parity with the numpy
        // builder (rel0 = float32(y - qh*bs) there)
        double rel0 = (double)(float)(y[a] - qh[a] * bs);
        int k = (int)std::ceil((ext - rel0) / bs);
        na[a] = k < m ? k : m;
      }
      for (int jx = 0; jx < na[0]; jx++)
        for (int jy = 0; jy < na[1]; jy++)
          for (int jz = 0; jz < na[2]; jz++) {
            int bx = ((qh[0] - jx) % m + m) % m;
            int by = ((qh[1] - jy) % m + m) % m;
            int bz = ((qh[2] - jz) % m + m) % m;
            h[(bx * m + by) * m + bz]++;
          }
    }
  }

  long long total = 0;
  for (int b = 0; b < n_t; b++) {
    long long cb = 0;
    for (int t = 0; t < nthreads; t++) cb += hist[(size_t)t * n_t + b];
    if (counts) counts[b] = cb;
    total += cb;
  }
  if (!rows) return total;

  // exclusive prefix over (block major, thread minor) -> write cursors
  std::vector<long long> cursor((size_t)nthreads * n_t);
  long long run = 0;
  for (int b = 0; b < n_t; b++) {
    if (starts) starts[b] = run;
    for (int t = 0; t < nthreads; t++) {
      cursor[(size_t)t * n_t + b] = run;
      run += hist[(size_t)t * n_t + b];
    }
  }

  // pass 2: stream rows to their final positions
#pragma omp parallel
  {
    const int t = omp_get_thread_num();
    long long* cur = cursor.data() + (size_t)t * n_t;
#pragma omp for schedule(static)
    for (long long i = 0; i < n; i++) {
      double y[3], rel0[3];
      int qh[3], na[3];
      for (int a = 0; a < 3; a++) {
        double p = std::fmod((double)pos[i * 3 + a], box);
        if (p < 0) p += box;
        y[a] = p + margin_phys;
        qh[a] = (int)std::floor(y[a] / bs);
        rel0[a] = (double)(float)(y[a] - qh[a] * bs);
        int k = (int)std::ceil((ext - rel0[a]) / bs);
        na[a] = k < m ? k : m;
      }
      for (int jx = 0; jx < na[0]; jx++)
        for (int jy = 0; jy < na[1]; jy++)
          for (int jz = 0; jz < na[2]; jz++) {
            int bx = ((qh[0] - jx) % m + m) % m;
            int by = ((qh[1] - jy) % m + m) % m;
            int bz = ((qh[2] - jz) % m + m) % m;
            long long at = cur[(bx * m + by) * m + bz]++;
            float* r = rows + at * 7;
            r[0] = (float)(rel0[0]) + (float)jx * (float)bs;
            r[1] = (float)(rel0[1]) + (float)jy * (float)bs;
            r[2] = (float)(rel0[2]) + (float)jz * (float)bs;
            r[3] = vel[i * 3 + 0];
            r[4] = vel[i * 3 + 1];
            r[5] = vel[i * 3 + 2];
            r[6] = rho[i];
          }
    }
  }
  return total;
}

// Candidate rows of ONE block at an arbitrary margin — the escalation
// path of the margin certificate (vpower_tpu/run/streamed.py:
// _single_block_rows): the pre-sorted runs were built for the base
// margin, so an escalated block re-selects from the full particle set.
// The numpy fallback rescans 10M rows per escalated block in Python;
// this is the same selection at C speed: a branchy per-axis INTERVAL
// prefilter rejects ~99% of particles on the first axis with 1-2
// compares, and only survivors pay the exact float64 wrap arithmetic
// that bit-matches the numpy builder.
//
// Single pass: writes up to `cap` rows of [rel_xyz, vel, rho] and
// returns the TRUE count (callers retry with a larger buffer when the
// return exceeds cap; rows == NULL counts only).
long long single_block_rows(const float* pos, const float* vel,
                            const float* rho, long long n, int m,
                            double box, double margin_phys,
                            int qx, int qy, int qz, float* rows,
                            long long cap) {
  const double bs = box / m;
  const double ext = bs + 2.0 * margin_phys;
  const double lo[3] = {qx * bs, qy * bs, qz * bs};
  // prefilter intervals [a0, a0 + ext) mod box, slackened so FP
  // rounding can never reject a true member (confirmed exactly below)
  const double slack = 4e-7 * box;
  double a0[3], a1[3];
  bool wrap[3];
  for (int a = 0; a < 3; a++) {
    double s0 = lo[a] - margin_phys - slack;
    double s1 = lo[a] - margin_phys + ext + slack;
    if (s0 < 0) { s0 += box; }
    if (s1 >= box) { s1 -= box; }
    a0[a] = s0;
    a1[a] = s1;
    wrap[a] = s1 < s0;  // interval crosses the box boundary
  }

  // OpenMP: static contiguous ranges + per-thread row buffers merged
  // in thread order keep rows in ascending particle order; the serial
  // path below is the nthreads == 1 degenerate case of the same loop.
  int nthreads = 1;
#if defined(_OPENMP)
#pragma omp parallel
  {
#pragma omp single
    nthreads = omp_get_num_threads();
  }
#endif
  if (nthreads > 1 && rows) {
    std::vector<std::vector<float>> bufs(nthreads);
    std::vector<long long> cnts(nthreads, 0);
#pragma omp parallel
    {
      const int t = omp_get_thread_num();
      std::vector<float>& buf = bufs[t];
      long long c = 0;
#pragma omp for schedule(static)
      for (long long i = 0; i < n; i++) {
        const float* P = pos + i * 3;
        double p0 = (double)P[0];
        bool in0 = wrap[0] ? (p0 >= a0[0] || p0 < a1[0])
                           : (p0 >= a0[0] && p0 < a1[0]);
        if (!in0 && p0 >= 0.0 && p0 < box) continue;
        double p1 = (double)P[1];
        bool in1 = wrap[1] ? (p1 >= a0[1] || p1 < a1[1])
                           : (p1 >= a0[1] && p1 < a1[1]);
        if (!in1 && p1 >= 0.0 && p1 < box) continue;
        double p2 = (double)P[2];
        bool in2 = wrap[2] ? (p2 >= a0[2] || p2 < a1[2])
                           : (p2 >= a0[2] && p2 < a1[2]);
        if (!in2 && p2 >= 0.0 && p2 < box) continue;
        double rel[3];
        bool in = true;
        for (int a = 0; a < 3 && in; a++) {
          double p = (double)P[a];
          if (p < 0.0 || p >= box) {
            p = std::fmod(p, box);
            if (p < 0) p += box;
          }
          double r = p - lo[a] + margin_phys;
          if (r < 0.0) r += box;
          else if (r >= box) r -= box;
          rel[a] = r;
          if (!(r < ext)) in = false;
        }
        if (!in) continue;
        buf.push_back((float)rel[0]);
        buf.push_back((float)rel[1]);
        buf.push_back((float)rel[2]);
        buf.push_back(vel[i * 3 + 0]);
        buf.push_back(vel[i * 3 + 1]);
        buf.push_back(vel[i * 3 + 2]);
        buf.push_back(rho[i]);
        c++;
      }
      cnts[t] = c;
    }
    long long total = 0;
    for (int t = 0; t < nthreads; t++) total += cnts[t];
    if (total <= cap) {
      long long at = 0;
      for (int t = 0; t < nthreads; t++) {
        std::memcpy(rows + at * 7, bufs[t].data(),
                    (size_t)cnts[t] * 7 * sizeof(float));
        at += cnts[t];
      }
    }
    return total;
  }

  long long count = 0;
  for (long long i = 0; i < n; i++) {
    const float* P = pos + i * 3;
    // axis-0 prefilter first: rejects most rows with 1-2 compares
    double p0 = (double)P[0];
    bool in0 = wrap[0] ? (p0 >= a0[0] || p0 < a1[0])
                       : (p0 >= a0[0] && p0 < a1[0]);
    if (!in0 && p0 >= 0.0 && p0 < box) continue;
    double p1 = (double)P[1];
    bool in1 = wrap[1] ? (p1 >= a0[1] || p1 < a1[1])
                       : (p1 >= a0[1] && p1 < a1[1]);
    if (!in1 && p1 >= 0.0 && p1 < box) continue;
    double p2 = (double)P[2];
    bool in2 = wrap[2] ? (p2 >= a0[2] || p2 < a1[2])
                       : (p2 >= a0[2] && p2 < a1[2]);
    if (!in2 && p2 >= 0.0 && p2 < box) continue;
    // exact confirm (bit-parity with the numpy builder)
    double rel[3];
    bool in = true;
    for (int a = 0; a < 3 && in; a++) {
      double p = (double)P[a];
      if (p < 0.0 || p >= box) {
        p = std::fmod(p, box);
        if (p < 0) p += box;
      }
      // conditional subtraction == fmod bit-exactly for in-range
      // inputs (FP remainders are exact)
      double r = p - lo[a] + margin_phys;
      if (r < 0.0) r += box;
      else if (r >= box) r -= box;
      rel[a] = r;
      if (!(r < ext)) in = false;
    }
    if (!in) continue;
    if (rows && count < cap) {
      float* r = rows + count * 7;
      r[0] = (float)rel[0];
      r[1] = (float)rel[1];
      r[2] = (float)rel[2];
      r[3] = vel[i * 3 + 0];
      r[4] = vel[i * 3 + 1];
      r[5] = vel[i * 3 + 2];
      r[6] = rho[i];
    }
    count++;
  }
  return count;
}

}  // extern "C"

// ---------------------------------------------------------------------
// Exact 1-NN kd-tree (the ANN-parity oracle)
// ---------------------------------------------------------------------
// The reference's library path is EXACT nearest-neighbor via the ANN
// C++ kd-tree (vpower/interp.py:1027-1034, eps=0).  The TPU multigrid
// assignment is exact except for a measured <=5e-3 buried-seed class on
// pathologically clustered inputs (deposit/nn.py docstring); this host
// kd-tree is the genuinely exact path for those regimes and the oracle
// the test suite validates against.  Median-split tree, iterative
// stack traversal, optional periodic minimum-image via pruned 27-image
// queries.

namespace {

struct KdNode {
  float split;
  int32_t axis;      // -1 marks a leaf
  int32_t left, right;   // children, or [leaf_begin, leaf_end) when leaf
};

struct KdTree {
  std::vector<KdNode> nodes;
  std::vector<int64_t> index;   // permutation into the point array
  const float* pts = nullptr;
  int64_t n = 0;
};

constexpr int kLeafSize = 16;

int32_t build_node(KdTree& t, int64_t begin, int64_t end, int depth) {
  int32_t id = (int32_t)t.nodes.size();
  t.nodes.push_back({});
  if (end - begin <= kLeafSize) {
    t.nodes[id] = {0.0f, -1, (int32_t)begin, (int32_t)end};
    return id;
  }
  // split on the widest axis
  float lo[3] = {1e30f, 1e30f, 1e30f}, hi[3] = {-1e30f, -1e30f, -1e30f};
  for (int64_t i = begin; i < end; ++i) {
    const float* p = t.pts + 3 * t.index[i];
    for (int a = 0; a < 3; ++a) {
      lo[a] = std::min(lo[a], p[a]);
      hi[a] = std::max(hi[a], p[a]);
    }
  }
  int axis = 0;
  for (int a = 1; a < 3; ++a)
    if (hi[a] - lo[a] > hi[axis] - lo[axis]) axis = a;
  int64_t mid = (begin + end) / 2;
  std::nth_element(
      t.index.begin() + begin, t.index.begin() + mid, t.index.begin() + end,
      [&](int64_t a, int64_t b) {
        return t.pts[3 * a + axis] < t.pts[3 * b + axis];
      });
  float split = t.pts[3 * t.index[mid] + axis];
  int32_t l = build_node(t, begin, mid, depth + 1);
  int32_t r = build_node(t, mid, end, depth + 1);
  t.nodes[id] = {split, (int32_t)axis, l, r};
  return id;
}

void query_one(const KdTree& t, const float q[3], float& best_d2,
               int64_t& best_i) {
  int32_t stack[128];
  float stack_d2[128];
  int top = 0;
  stack[top] = 0;
  stack_d2[top] = 0.0f;
  while (top >= 0) {
    if (stack_d2[top] >= best_d2) { --top; continue; }
    int32_t id = stack[top--];
    const KdNode& nd = t.nodes[id];
    if (nd.axis < 0) {
      for (int32_t i = nd.left; i < nd.right; ++i) {
        const float* p = t.pts + 3 * t.index[i];
        float dx = q[0] - p[0], dy = q[1] - p[1], dz = q[2] - p[2];
        float d2 = dx * dx + dy * dy + dz * dz;
        if (d2 < best_d2 ||
            (d2 == best_d2 && t.index[i] < best_i)) {  // deterministic tie
          best_d2 = d2;
          best_i = t.index[i];
        }
      }
      continue;
    }
    float delta = q[nd.axis] - nd.split;
    int32_t near = delta < 0 ? nd.left : nd.right;
    int32_t far = delta < 0 ? nd.right : nd.left;
    float far_d2 = delta * delta;
    if (far_d2 < best_d2 && top + 2 < 128) {
      stack[++top] = far;
      stack_d2[top] = far_d2;
    }
    stack[++top] = near;
    stack_d2[top] = 0.0f;
  }
}

}  // namespace

extern "C" {

// Exact 1-NN of nq query points among n points (both (*,3) float32 in
// [0, box)).  periodic != 0 uses the minimum-image metric via image
// queries pruned to those that can beat the in-box answer.  Returns 0.
int nn_exact(const float* pts, long long n, const float* queries,
             long long nq, double box, int periodic, int64_t* out_idx) {
  if (n <= 0 || nq < 0) return -1;
  KdTree t;
  t.pts = pts;
  t.n = n;
  t.index.resize((size_t)n);
  for (int64_t i = 0; i < n; ++i) t.index[(size_t)i] = i;
  t.nodes.reserve((size_t)(2.2 * n / kLeafSize + 64));
  build_node(t, 0, n, 0);
  float fbox = (float)box;

#if defined(_OPENMP)
#pragma omp parallel for schedule(dynamic, 1024)
#endif
  for (int64_t qi = 0; qi < nq; ++qi) {
    const float* q0 = queries + 3 * qi;
    float best_d2 = 1e30f;
    int64_t best_i = -1;
    float q[3] = {q0[0], q0[1], q0[2]};
    query_one(t, q, best_d2, best_i);
    if (periodic) {
      float best_d = std::sqrt(best_d2);
      for (int ix = -1; ix <= 1; ++ix)
        for (int iy = -1; iy <= 1; ++iy)
          for (int iz = -1; iz <= 1; ++iz) {
            if (!ix && !iy && !iz) continue;
            // image can only win if q is within best_d of that face
            float qq[3] = {q0[0] + ix * fbox, q0[1] + iy * fbox,
                           q0[2] + iz * fbox};
            float gap = 0.0f;
            for (int a = 0; a < 3; ++a) {
              float d = std::max({qq[a] - fbox, -qq[a], 0.0f});
              gap += d * d;
            }
            if (gap < best_d2) query_one(t, qq, best_d2, best_i);
            (void)best_d;
          }
    }
    out_idx[qi] = best_i;
  }
  return 0;
}

}  // extern "C"
