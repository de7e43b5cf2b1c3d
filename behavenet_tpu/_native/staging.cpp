// Native staging kernels for the input pipeline's host-side hot loop.
//
// The training input path (reference data_generator.py:551-633 reads the
// same trials through h5py) moves ~0.5 GB/s/chip of uint8 video per the
// SURVEY hard-part-4 budget. The Python path costs three full passes per
// trial: preadv into a fresh array, NCHW->NHWC transpose copy
// (np.ascontiguousarray), and the bucket pad copy. These kernels fuse the
// first two (read straight into the NHWC destination, zeroing the pad tail
// so the bucket pad is free too) and split both the read and the transpose
// across threads — torch's equivalent lives in its C++ DataLoader workers;
// here it is an explicit library bound via ctypes (no pybind11 in the
// image).
//
// Contracts:
//  * every function returns 0 on success, -1 on a short read / IO error;
//  * `fd` is shared and only ever touched with pread (offset-explicit), so
//    concurrent prefetch workers need no locking;
//  * callers own all buffers; nothing here allocates beyond thread-local
//    scratch.

#include <cerrno>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <unistd.h>

namespace {

// pread the full [offset, offset+nbytes) range into dst; loops on partial
// reads and EINTR. Returns 0 iff every byte landed.
int pread_full(int fd, long long offset, long long nbytes, char* dst) {
  long long done = 0;
  while (done < nbytes) {
    ssize_t n = ::pread(fd, dst + done,
                        static_cast<size_t>(nbytes - done),
                        static_cast<off_t>(offset + done));
    if (n < 0) {
      if (errno == EINTR) continue;
      return -1;
    }
    if (n == 0) return -1;  // truncated file
    done += n;
  }
  return 0;
}

// Number of worker threads for a job of `nbytes`: one thread per ~1 MiB,
// capped at the caller's budget — tiny trials stay on the calling thread.
int clamp_threads(int nthreads, long long nbytes) {
  long long by_size = nbytes / (1 << 20);
  if (by_size < 1) by_size = 1;
  if (nthreads > by_size) nthreads = static_cast<int>(by_size);
  if (nthreads < 1) nthreads = 1;
  return nthreads;
}

// Scatter one frame from channel-planar (C,H,W) scratch into interleaved
// rows of the NHWC destination. Specialized small-C element sizes cover the
// behavenet formats (uint8 video C=1/2, float32 masks).
template <typename T>
void interleave_frame(const T* src, T* dst, long long C, long long H,
                      long long W) {
  for (long long h = 0; h < H; ++h) {
    if (C == 1) {
      std::memcpy(dst + h * W, src + h * W, sizeof(T) * W);
    } else if (C == 2) {
      const T* a = src + h * W;
      const T* b = src + (H + h) * W;
      T* o = dst + h * W * 2;
      for (long long w = 0; w < W; ++w) {
        o[2 * w] = a[w];
        o[2 * w + 1] = b[w];
      }
    } else {
      T* o = dst + h * W * C;
      for (long long c = 0; c < C; ++c) {
        const T* a = src + (c * H + h) * W;
        for (long long w = 0; w < W; ++w) o[w * C + c] = a[w];
      }
    }
  }
}

}  // namespace

extern "C" {

// Parallel chunked pread of nbytes at offset into out.
int bn_pread(int fd, long long offset, long long nbytes, void* out,
             int nthreads) {
  nthreads = clamp_threads(nthreads, nbytes);
  char* dst = static_cast<char*>(out);
  if (nthreads == 1) return pread_full(fd, offset, nbytes, dst);

  std::vector<std::thread> pool;
  std::vector<int> rc(nthreads, 0);
  long long chunk = (nbytes + nthreads - 1) / nthreads;
  for (int i = 0; i < nthreads; ++i) {
    long long lo = i * chunk;
    long long hi = lo + chunk < nbytes ? lo + chunk : nbytes;
    if (lo >= hi) break;
    pool.emplace_back([=, &rc] {
      rc[i] = pread_full(fd, offset + lo, hi - lo, dst + lo);
    });
  }
  for (auto& t : pool) t.join();
  for (int r : rc)
    if (r != 0) return -1;
  return 0;
}

// Fused read + NCHW->NHWC transpose (+ bucket-pad zeroing).
//
// Reads a (T, C, H, W) array of `itemsize`-byte elements at `offset` and
// writes it as (t_pad, H, W, C) into `out` (caller-allocated, capacity
// t_pad*H*W*C elements), zero-filling frames [T, t_pad). Frames are
// partitioned across threads; each thread preads its frames into a
// CHW-sized scratch and interleaves. itemsize must be 1, 2, 4, or 8.
int bn_read_nchw_as_nhwc(int fd, long long offset, long long T, long long C,
                         long long H, long long W, int itemsize, void* out,
                         long long t_pad, int nthreads) {
  if (itemsize != 1 && itemsize != 2 && itemsize != 4 && itemsize != 8)
    return -1;
  if (t_pad < T || T < 0 || C <= 0 || H <= 0 || W <= 0) return -1;
  const long long frame = C * H * W * itemsize;
  char* dst = static_cast<char*>(out);
  if (t_pad > T)
    std::memset(dst + T * frame, 0, static_cast<size_t>((t_pad - T) * frame));
  if (T == 0) return 0;

  // single-channel NCHW and NHWC are byte-identical: no interleave, no
  // scratch round-trip — one parallel chunked read straight into dst
  if (C == 1) return bn_pread(fd, offset, T * frame, dst, nthreads);

  nthreads = clamp_threads(nthreads, T * frame);
  if (nthreads > T) nthreads = static_cast<int>(T);

  auto run = [=](long long t0, long long t1) -> int {
    std::vector<char> scratch(static_cast<size_t>(frame));
    for (long long t = t0; t < t1; ++t) {
      if (pread_full(fd, offset + t * frame, frame, scratch.data()) != 0)
        return -1;
      char* o = dst + t * frame;
      switch (itemsize) {
        case 1:
          interleave_frame(reinterpret_cast<const uint8_t*>(scratch.data()),
                           reinterpret_cast<uint8_t*>(o), C, H, W);
          break;
        case 2:
          interleave_frame(reinterpret_cast<const uint16_t*>(scratch.data()),
                           reinterpret_cast<uint16_t*>(o), C, H, W);
          break;
        case 4:
          interleave_frame(reinterpret_cast<const uint32_t*>(scratch.data()),
                           reinterpret_cast<uint32_t*>(o), C, H, W);
          break;
        default:
          interleave_frame(reinterpret_cast<const uint64_t*>(scratch.data()),
                           reinterpret_cast<uint64_t*>(o), C, H, W);
      }
    }
    return 0;
  };

  if (nthreads == 1) return run(0, T);
  std::vector<std::thread> pool;
  std::vector<int> rc(nthreads, 0);
  long long per = (T + nthreads - 1) / nthreads;
  for (int i = 0; i < nthreads; ++i) {
    long long lo = i * per;
    long long hi = lo + per < T ? lo + per : T;
    if (lo >= hi) break;
    pool.emplace_back([=, &rc] { rc[i] = run(lo, hi); });
  }
  for (auto& t : pool) t.join();
  for (int r : rc)
    if (r != 0) return -1;
  return 0;
}

}  // extern "C"
