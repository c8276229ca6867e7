// CPU identity fingerprint for the host-keyed XLA compile cache.
//
// The deployment VMs present a fully generic /proc/cpuinfo (model name
// "Intel(R) Xeon(R) Processor @ 2.70GHz", microcode 0x1) on *different*
// physical hosts, so keying the persistent compile cache on cpuinfo alone
// still let one host load another's XLA:CPU AOT artifacts (cpu_aot_loader
// "machine feature +prefer-no-gather is not supported on the host machine",
// potential SIGILL). LLVM's host detection — which decides those AOT target
// features — reads CPUID + XGETBV directly, so the only reliable key is a
// dump of exactly that surface: every CPUID leaf LLVM consults, plus XCR0.
//
// eioku_cpuid_fingerprint(buf, cap) writes a hex summary of:
//   leaf 0 (vendor), 1 (family/model/stepping + features), 6, 7.{0,1,2}
//   (extended features incl. AVX512*, AMX), 0xD (xsave), 0x14,
//   0x80000001/0x80000008 (AMD ext), and XGETBV(0) when OSXSAVE is set.
// Returns the number of bytes written (excluding NUL), or -1 on overflow.
#include <cstdint>
#include <cstdio>
#include <cstring>

#if defined(__x86_64__) || defined(__i386__)
#include <cpuid.h>

static void leaf(uint32_t eax_in, uint32_t ecx_in, uint32_t out[4]) {
  unsigned int a = 0, b = 0, c = 0, d = 0;
  __get_cpuid_count(eax_in, ecx_in, &a, &b, &c, &d);
  out[0] = a; out[1] = b; out[2] = c; out[3] = d;
}

static uint64_t xgetbv0() {
  uint32_t eax, edx;
  __asm__ volatile(".byte 0x0f, 0x01, 0xd0" : "=a"(eax), "=d"(edx) : "c"(0));
  return (static_cast<uint64_t>(edx) << 32) | eax;
}
#endif

extern "C" int eioku_cpuid_fingerprint(char* buf, int cap) {
  if (!buf || cap <= 0) return -1;
  int n = 0;
#if defined(__x86_64__) || defined(__i386__)
  static const uint32_t leaves[][2] = {
      {0, 0},          {1, 0},          {6, 0},          {7, 0},
      {7, 1},          {7, 2},          {0xD, 0},        {0xD, 1},
      {0x14, 0},       {0x80000001, 0}, {0x80000008, 0},
  };
  uint32_t r[4];
  for (auto& lv : leaves) {
    leaf(lv[0], lv[1], r);
    int w = snprintf(buf + n, cap - n, "%x.%x:%08x%08x%08x%08x;",
                     lv[0], lv[1], r[0], r[1], r[2], r[3]);
    if (w < 0 || w >= cap - n) return -1;
    n += w;
  }
  leaf(1, 0, r);
  if (r[2] & (1u << 27)) {  // OSXSAVE: XGETBV is executable
    int w = snprintf(buf + n, cap - n, "xcr0:%016llx;",
                     static_cast<unsigned long long>(xgetbv0()));
    if (w < 0 || w >= cap - n) return -1;
    n += w;
  }
#else
  int w = snprintf(buf + n, cap - n, "non-x86;");
  if (w < 0 || w >= cap - n) return -1;
  n += w;
#endif
  return n;
}
