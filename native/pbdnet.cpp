// pbdnet: native PBD1 server front-end.
//
// The reference's runtime is C++ around the solver (Net.cpp/Server.cpp/
// main.cpp: blocking sockets, exact-read framing, single-client comm loop).
// Here the same native layers run the wire protocol while the compute
// callbacks dispatch into the JAX engine (Python registers C function
// pointers via ctypes; ctypes acquires the GIL on callback entry).
//
// Wire format identical to api/protocol.py:
//   header {u32 magic 'PBD1', u32 type, u32 size} (little-endian)
//   MSG_INIT=1  payload handed to the init callback verbatim
//   MSG_STEP=2  f32 dt -> step callback -> MSG_POSITIONS (V*3 f32)
//   MSG_SHUTDOWN=4 (or any malformed frame) ends the session

#include <arpa/inet.h>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <sys/socket.h>
#include <unistd.h>
#include <vector>

namespace {

constexpr uint32_t kMagic = 0x31444250u;  // 'PBD1'
constexpr uint32_t kMsgInit = 1, kMsgStep = 2, kMsgPositions = 3,
                   kMsgShutdown = 4;
constexpr uint32_t kMaxPayload = 1u << 30;

#pragma pack(push, 1)
struct Header {
  uint32_t magic, type, size;
};
#pragma pack(pop)

bool recv_exact(int fd, void* dst, size_t n) {
  auto* p = static_cast<uint8_t*>(dst);
  while (n) {
    ssize_t got = ::recv(fd, p, n, 0);
    if (got <= 0) return false;
    p += got;
    n -= (size_t)got;
  }
  return true;
}

bool send_exact(int fd, const void* src, size_t n) {
  auto* p = static_cast<const uint8_t*>(src);
  while (n) {
    ssize_t sent = ::send(fd, p, n, 0);
    if (sent <= 0) return false;
    p += sent;
    n -= (size_t)sent;
  }
  return true;
}

}  // namespace

extern "C" {

// init: full MSG_INIT payload; return 0 on success (nonzero ends session).
typedef int (*sb_init_cb)(const uint8_t* payload, uint64_t size);
// step: dt in; fills *out_positions with a pointer to V*3 floats (valid
// until the next callback) and *out_count with V*3; nonzero return ends
// the session.
typedef int (*sb_step_cb)(float dt, const float** out_positions,
                          uint64_t* out_count);
// ready: called with the bound port before accept (port 0 -> ephemeral).
typedef void (*sb_ready_cb)(int port);

// Serve one client (blocking; single-client, loopback -- exactly the
// reference's deployment shape).  Returns 0 on orderly shutdown.
int sb_serve(int port, sb_init_cb on_init, sb_step_cb on_step,
             sb_ready_cb on_ready, int verbose) {
  int srv = ::socket(AF_INET, SOCK_STREAM, 0);
  if (srv < 0) return -1;
  int one = 1;
  ::setsockopt(srv, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
  addr.sin_port = htons((uint16_t)port);
  if (::bind(srv, (sockaddr*)&addr, sizeof(addr)) != 0) {
    ::close(srv);
    return -2;
  }
  socklen_t alen = sizeof(addr);
  ::getsockname(srv, (sockaddr*)&addr, &alen);
  int bound = ntohs(addr.sin_port);
  if (::listen(srv, 1) != 0) {
    ::close(srv);
    return -3;
  }
  if (on_ready) on_ready(bound);
  if (verbose) std::printf("[pbdnet] listening on 127.0.0.1:%d\n", bound);

  int cli = ::accept(srv, nullptr, nullptr);
  if (cli < 0) {
    ::close(srv);
    return -4;
  }
  ::setsockopt(cli, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
  if (verbose) std::printf("[pbdnet] client connected\n");

  std::vector<uint8_t> payload;
  while (true) {
    Header h{};
    if (!recv_exact(cli, &h, sizeof(h))) break;
    if (h.magic != kMagic || h.size > kMaxPayload) break;
    payload.resize(h.size);
    if (h.size && !recv_exact(cli, payload.data(), h.size)) break;

    if (h.type == kMsgInit) {
      if (on_init(payload.data(), h.size) != 0) break;
    } else if (h.type == kMsgStep) {
      if (h.size < 4) break;
      float dt;
      std::memcpy(&dt, payload.data(), 4);
      const float* pos = nullptr;
      uint64_t count = 0;
      if (on_step(dt, &pos, &count) != 0) break;
      Header out{kMagic, kMsgPositions, (uint32_t)(count * 4)};
      if (!send_exact(cli, &out, sizeof(out))) break;
      if (count && !send_exact(cli, pos, count * 4)) break;
    } else if (h.type == kMsgShutdown) {
      break;
    } else {
      break;
    }
  }
  ::close(cli);
  ::close(srv);
  if (verbose) std::printf("[pbdnet] shut down\n");
  return 0;
}

}  // extern "C"
