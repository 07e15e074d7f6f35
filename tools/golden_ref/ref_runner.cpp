// Golden-trace driver around the REFERENCE solver (not part of the framework).
//
// This tiny program links against the unmodified reference sources
// (CProgram/src/Sim.cpp + CProgram/include/PBDServer.h, compiled straight out
// of the read-only reference checkout at test time) and exposes the serial
// stepper as a batch subprocess: read one binary scenario description, run N
// steps of SerialStepper::step (Sim.cpp:280-305), write sampled positions and
// the final state.  tests/test_golden_ref.py uses it to ground the NumPy
// oracle (tests/oracle.py) and the JAX backends against the *actual compiled
// C++ reference* instead of a hand-written reimplementation.
//
// The framework itself never uses this; it exists only so the parity claims
// are anchored to the real thing.  Build: tests/golden_ref.py (compiles with
// -ffp-contract=off so the C++ arithmetic is plain IEEE fp32, comparable
// bit-for-bit with NumPy float32).
//
// Input (little-endian, argv[1]):
//   u32 magic 0x31464552 ("REF1")
//   u32 V, E, T, P
//   u32 substeps, iterations
//   f32 edgeCompliance, volumeCompliance
//   f32 gravity[3]
//   u32 groundEnabled;  f32 groundY, friction
//   f32 dt;  u32 nsteps, sampleEvery (0 = NO position samples; the
//   Python wrapper maps 0 -> nsteps for final-only sampling)
//   u32 pinned[P];  f32 x0[V*3];  u32 edges[E*2];  u32 tets[T*4]
// Output (argv[2]):
//   u32 numSamples; { f32 x[V*3]; f32 v[V*3] } * numSamples
//   f32 v[V*3];  f32 edgeLambda[E];  f32 tetLambda[T]
// (velocities ride along with each position sample so convergence
// energy curves can be computed from the reference trajectory --
// perf/convergence.py "serial_golden")

#include "PBDServer.h"

#include <cstdio>
#include <vector>

namespace {

template <class T>
bool read_vec(FILE* f, std::vector<T>& out, size_t n) {
  out.resize(n);
  return n == 0 || std::fread(out.data(), sizeof(T), n, f) == n;
}

template <class T>
bool write_vec(FILE* f, const std::vector<T>& v) {
  return v.empty() || std::fwrite(v.data(), sizeof(T), v.size(), f) == v.size();
}

bool read_u32(FILE* f, uint32_t& v) {
  return std::fread(&v, sizeof(v), 1, f) == 1;
}

bool read_f32(FILE* f, float& v) { return std::fread(&v, sizeof(v), 1, f) == 1; }

}  // namespace

int main(int argc, char** argv) {
  if (argc != 3) {
    std::fprintf(stderr, "usage: ref_runner <in.bin> <out.bin>\n");
    return 2;
  }
  FILE* in = std::fopen(argv[1], "rb");
  if (!in) { std::perror("open input"); return 2; }

  uint32_t magic = 0, V, E, T, P, substeps, iterations;
  uint32_t groundEnabled, nsteps, sampleEvery;
  float edgeComp, volComp, g[3], groundY, friction, dt;
  bool ok = read_u32(in, magic) && magic == 0x31464552u &&
            read_u32(in, V) && read_u32(in, E) && read_u32(in, T) &&
            read_u32(in, P) && read_u32(in, substeps) &&
            read_u32(in, iterations) && read_f32(in, edgeComp) &&
            read_f32(in, volComp) && read_f32(in, g[0]) &&
            read_f32(in, g[1]) && read_f32(in, g[2]) &&
            read_u32(in, groundEnabled) && read_f32(in, groundY) &&
            read_f32(in, friction) && read_f32(in, dt) &&
            read_u32(in, nsteps) && read_u32(in, sampleEvery);
  if (!ok) { std::fprintf(stderr, "bad header\n"); return 2; }

  std::vector<uint32_t> pinned, edges, tets;
  std::vector<float> x0;
  if (!read_vec(in, pinned, P) || !read_vec(in, x0, size_t(V) * 3) ||
      !read_vec(in, edges, size_t(E) * 2) || !read_vec(in, tets, size_t(T) * 4)) {
    std::fprintf(stderr, "bad payload\n");
    return 2;
  }
  std::fclose(in);

  // Populate PBDState exactly as the server's MSG_INIT handler would
  // (Server.cpp:30-113): raw arrays in, then compute_inv_mass + build_rest.
  PBDState s;
  s.V = V; s.E = E; s.T = T;
  s.params.substeps = substeps;
  s.params.iterations = iterations;
  s.params.edgeCompliance = edgeComp;
  s.params.volumeCompliance = volComp;
  s.params.gravity = Vec3(g[0], g[1], g[2]);
  s.params.groundEnabled = groundEnabled;
  s.params.groundY = groundY;
  s.params.friction = friction;

  s.x.resize(V); s.v.assign(V, Vec3()); s.xStar.resize(V);
  for (uint32_t i = 0; i < V; ++i) {
    s.x[i] = Vec3(x0[i * 3 + 0], x0[i * 3 + 1], x0[i * 3 + 2]);
    s.xStar[i] = s.x[i];
  }
  s.edgeI0.resize(E); s.edgeI1.resize(E);
  for (uint32_t e = 0; e < E; ++e) {
    s.edgeI0[e] = edges[e * 2 + 0];
    s.edgeI1[e] = edges[e * 2 + 1];
  }
  s.tetA.resize(T); s.tetB.resize(T); s.tetC.resize(T); s.tetD.resize(T);
  for (uint32_t t = 0; t < T; ++t) {
    s.tetA[t] = tets[t * 4 + 0];
    s.tetB[t] = tets[t * 4 + 1];
    s.tetC[t] = tets[t * 4 + 2];
    s.tetD[t] = tets[t * 4 + 3];
  }
  compute_inv_mass(s, pinned);
  build_rest(s);

  FILE* out = std::fopen(argv[2], "wb");
  if (!out) { std::perror("open output"); return 2; }

  uint32_t numSamples = sampleEvery ? nsteps / sampleEvery : 0;
  std::fwrite(&numSamples, sizeof(numSamples), 1, out);

  SerialStepper stepper;
  perf::StepStats stats{};
  std::vector<float> xs(size_t(V) * 3), vsmp(size_t(V) * 3);
  for (uint32_t step = 1; step <= nsteps; ++step) {
    stepper.step(s, dt, stats);
    if (sampleEvery && step % sampleEvery == 0) {
      for (uint32_t i = 0; i < V; ++i) {
        xs[i * 3 + 0] = s.x[i].x;
        xs[i * 3 + 1] = s.x[i].y;
        xs[i * 3 + 2] = s.x[i].z;
        vsmp[i * 3 + 0] = s.v[i].x;
        vsmp[i * 3 + 1] = s.v[i].y;
        vsmp[i * 3 + 2] = s.v[i].z;
      }
      write_vec(out, xs);
      write_vec(out, vsmp);
    }
  }

  std::vector<float> vs(size_t(V) * 3);
  for (uint32_t i = 0; i < V; ++i) {
    vs[i * 3 + 0] = s.v[i].x;
    vs[i * 3 + 1] = s.v[i].y;
    vs[i * 3 + 2] = s.v[i].z;
  }
  write_vec(out, vs);
  write_vec(out, s.edgeLambda);
  write_vec(out, s.tetLambda);
  std::fclose(out);
  return 0;
}
