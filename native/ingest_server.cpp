// GIL-free protocol ingest for the nemotron_tpu streaming server.
//
// Why this exists: the TPU client library holds the Python GIL for the whole
// host<->device round-trip (~200 ms/step through a tunnel at B=768). Any
// Python-side socket loop in the same process therefore freezes while the
// engine thread talks to the device, and client audio staging lags a full
// step behind (measured: the end-to-end bench was ~95% tunnel I/O with a
// ~180 ms inter-tick gap tracking the device calls). The reference keeps its
// ingest in C++ threads for the same class of reason
// (src/nemo-server.cpp:192-271 worker + reader threads).
//
// This file owns everything between the TCP/unix socket and the engine:
//   - accept / epoll read/write on a dedicated native thread (never takes
//     the GIL)
//   - wire-protocol framing ([u8 opcode][u32 stream_id][u32 len][payload],
//     byte-compatible with src/server-protocol.h:25-56)
//   - OP_PUSH handled entirely natively: PCM appended to a per-stream ring,
//     ACK {"queued_samples":N} sent back, global admission budget enforced
//     by parking the connection (stop reading) while over budget — the
//     reference's blocking-reader backpressure (nemo-server.cpp:116-126)
//   - control ops (START / SET_LANG / END / disconnect) forwarded to Python
//     through a polled event queue; Python replies via ingest_send
//   - batched audio handoff: the engine fills its [B, k*shift] int16 tick
//     block with ONE ingest_take_block call (memcpy per active row)
//
// The Python side (serving/native_server.py) keeps: slot claim/release,
// event->frame payloads, and the device tick. It is the ONLY Python thread,
// so the GIL never gates ingest.
//
// Build: g++ -O3 -shared -fPIC -pthread -o libnemotron_ingest.so ingest_server.cpp

#include <arpa/inet.h>
#include <fcntl.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <sys/epoll.h>
#include <sys/eventfd.h>
#include <sys/socket.h>
#include <sys/un.h>
#include <unistd.h>

#include <atomic>
#include <cerrno>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

// ---- wire protocol (server-protocol.h) ------------------------------------
constexpr uint8_t OP_STREAM_START = 0x01;
constexpr uint8_t OP_PUSH = 0x02;
constexpr uint8_t OP_STREAM_END = 0x03;
constexpr uint8_t OP_SET_LANG = 0x04;
constexpr uint8_t OP_ACK = 0x82;
constexpr uint8_t OP_ERROR = 0x8F;
constexpr size_t HEADER_SIZE = 9;
constexpr uint32_t MAX_PAYLOAD = 64u << 20;
// Control payloads (START config JSON, language codes) are clamped so the
// head of the control queue always fits Python's poll buffer (1 MB in
// serving/ingest.py) — an oversized event could otherwise never drain and
// would wedge stream admission behind it forever.
constexpr size_t MAX_CTRL_PAYLOAD = 64u << 10;

// ---- control events forwarded to Python ------------------------------------
constexpr uint8_t EV_START = 1;     // payload: START JSON config
constexpr uint8_t EV_SET_LANG = 2;  // payload: language code
constexpr uint8_t EV_END = 3;       // graceful OP_STREAM_END for sid
constexpr uint8_t EV_DROP = 4;      // connection died; sid abandoned

struct ControlEvent {
  uint8_t type;
  uint64_t conn;
  uint32_t sid;
  std::vector<uint8_t> payload;
};

// Growable SPSC-ish byte ring for staged PCM (int16 samples). All access is
// under the global mutex (appends are one memcpy; takes are one or two), so
// a plain compacting vector is simpler and fast enough: head advances on
// take, the buffer compacts when the dead prefix exceeds the live half.
struct SampleRing {
  std::vector<int16_t> buf;
  size_t head = 0;  // read offset into buf

  size_t size() const { return buf.size() - head; }

  void append(const int16_t* data, size_t n) {
    if (head > (4u << 10) && head * 2 > buf.size()) {
      buf.erase(buf.begin(), buf.begin() + (ptrdiff_t)head);
      head = 0;
    }
    buf.insert(buf.end(), data, data + n);
  }

  // Copy up to n samples into out, zero-fill the remainder; returns copied.
  size_t take(int16_t* out, size_t n) {
    size_t got = std::min(n, size());
    std::memcpy(out, buf.data() + head, got * sizeof(int16_t));
    if (got < n) std::memset(out + got, 0, (n - got) * sizeof(int16_t));
    head += got;
    if (head == buf.size()) { buf.clear(); head = 0; }
    return got;
  }
};

struct Stream {
  SampleRing ring;
  uint64_t total_pushed = 0;  // samples ever appended
  uint64_t conn = 0;
};

struct Conn {
  int fd = -1;
  uint64_t id = 0;
  std::vector<uint8_t> rbuf;
  size_t rpos = 0;  // parsed-up-to offset
  std::deque<std::vector<uint8_t>> wq;
  size_t woff = 0;  // progress into wq.front()
  bool parked = false;     // reading paused (admission budget)
  bool want_write = false; // EPOLLOUT registered
  size_t push_done = 0;    // samples of the PUSH at rpos already staged
                           // (partial admission across park/unpark)
  std::vector<uint32_t> sids;
};

struct Server {
  int epfd = -1;
  int listen_fd = -1;
  int wake_fd = -1;  // eventfd: send-queue / unpark kicks for the IO thread
  std::thread io_thread;
  std::atomic<bool> stop{false};

  std::mutex mu;
  std::condition_variable work_cv;  // signaled toward Python's ingest_wait
  bool work = false;

  std::unordered_map<uint64_t, Conn*> conns;
  std::unordered_map<uint32_t, Stream*> streams;
  std::deque<ControlEvent> control;
  uint64_t next_conn_id = 1;

  int64_t budget_bytes = 64ll << 20;
  int64_t used_bytes = 0;
  bool any_parked = false;

  std::string unix_path;
};

Server* g_srv = nullptr;

void kick_io(Server* s) {
  uint64_t one = 1;
  ssize_t r = write(s->wake_fd, &one, sizeof(one));
  (void)r;
}

void set_nonblock(int fd) {
  int fl = fcntl(fd, F_GETFL, 0);
  fcntl(fd, F_SETFL, fl | O_NONBLOCK);
}

void epoll_update(Server* s, Conn* c) {
  epoll_event ev{};
  ev.events = (c->parked ? 0u : (uint32_t)EPOLLIN) |
              (c->want_write ? (uint32_t)EPOLLOUT : 0u);
  ev.data.u64 = c->id;
  epoll_ctl(s->epfd, EPOLL_CTL_MOD, c->fd, &ev);
}

void enqueue_frame_locked(Server* s, Conn* c, uint8_t opcode, uint32_t sid,
                          const uint8_t* payload, size_t len) {
  std::vector<uint8_t> frame(HEADER_SIZE + len);
  frame[0] = opcode;
  std::memcpy(frame.data() + 1, &sid, 4);
  uint32_t len32 = (uint32_t)len;
  std::memcpy(frame.data() + 5, &len32, 4);
  if (len) std::memcpy(frame.data() + HEADER_SIZE, payload, len);
  c->wq.push_back(std::move(frame));
}

// Flush as much of the write queue as the socket takes. mu held.
void flush_writes_locked(Server* s, Conn* c) {
  while (!c->wq.empty()) {
    auto& f = c->wq.front();
    ssize_t n = send(c->fd, f.data() + c->woff, f.size() - c->woff,
                     MSG_NOSIGNAL | MSG_DONTWAIT);
    if (n < 0) break;  // EAGAIN or error; error surfaces on next epoll round
    c->woff += (size_t)n;
    if (c->woff == f.size()) {
      c->wq.pop_front();
      c->woff = 0;
    } else {
      break;
    }
  }
  bool ww = !c->wq.empty();
  if (ww != c->want_write) {
    c->want_write = ww;
    epoll_update(s, c);
  }
}

void unpark_all_locked(Server* s);

void close_conn_locked(Server* s, Conn* c) {
  epoll_ctl(s->epfd, EPOLL_CTL_DEL, c->fd, nullptr);
  close(c->fd);
  s->conns.erase(c->id);
  // abandon this connection's streams: free their budget, tell Python
  int64_t freed = 0;
  for (uint32_t sid : c->sids) {
    auto it = s->streams.find(sid);
    if (it != s->streams.end()) {
      freed += (int64_t)(it->second->ring.size() * sizeof(int16_t));
      delete it->second;
      s->streams.erase(it);
    }
    s->control.push_back(ControlEvent{EV_DROP, c->id, sid, {}});
  }
  bool had = !c->sids.empty();
  delete c;
  if (freed > 0) {
    s->used_bytes -= freed;
    // connections parked on the admission budget must see the release —
    // nothing else retriggers them if the dead conn held all the budget
    unpark_all_locked(s);
  }
  if (had) {
    s->work = true;
    s->work_cv.notify_all();
  }
}

void unpark_all_locked(Server* s) {
  if (!s->any_parked) return;
  s->any_parked = false;
  for (auto& [id, c] : s->conns) {
    if (c->parked) {
      c->parked = false;
      epoll_update(s, c);
    }
  }
}

// Process complete frames in c->rbuf. Returns false if the conn must close.
// mu held.
bool process_rbuf_locked(Server* s, Conn* c) {
  for (;;) {
    size_t avail = c->rbuf.size() - c->rpos;
    if (avail < HEADER_SIZE) break;
    const uint8_t* p = c->rbuf.data() + c->rpos;
    uint8_t opcode = p[0];
    uint32_t sid, len;
    std::memcpy(&sid, p + 1, 4);
    std::memcpy(&len, p + 5, 4);
    if (len > MAX_PAYLOAD) return false;
    if (avail - HEADER_SIZE < len) break;
    const uint8_t* payload = p + HEADER_SIZE;

    if (opcode == OP_PUSH) {
      auto it = s->streams.find(sid);
      // stale-session DATA is ignored (reference: nemo-server.cpp:233)
      if (it != s->streams.end()) {
        // admission budget with PARTIAL admission: stage as many of the
        // frame's samples as fit, then park the connection; the same frame
        // resumes (from push_done) when the engine frees budget. All-or-
        // nothing admission wedges: the engine only takes whole chunks, so
        // every ring keeps a sub-chunk tail and used_bytes never returns to
        // zero — a frame larger than the remaining headroom would park
        // forever. (The reference never holds tails: its worker drains ALL
        // queued PCM per DATA event, nemo-server.cpp:230-239.)
        Stream* st = it->second;
        size_t total = len / sizeof(int16_t);
        int64_t free_bytes = s->budget_bytes - s->used_bytes;
        size_t fit = free_bytes > 0
                         ? (size_t)(free_bytes / (int64_t)sizeof(int16_t))
                         : 0;
        size_t take = std::min(total - c->push_done, fit);
        if (take > 0) {
          st->ring.append(
              reinterpret_cast<const int16_t*>(payload) + c->push_done, take);
          st->total_pushed += take;
          s->used_bytes += (int64_t)(take * sizeof(int16_t));
          c->push_done += take;
          s->work = true;  // the engine may have a runnable chunk now
        }
        if (c->push_done < total) {
          c->parked = true;
          s->any_parked = true;
          epoll_update(s, c);
          // samples staged before parking may have set work: wake the
          // engine now (the early return skips the end-of-loop notify)
          if (s->work) s->work_cv.notify_all();
          return true;
        }
        c->push_done = 0;
        char ack[64];
        int alen = snprintf(ack, sizeof(ack), "{\"queued_samples\": %zu}",
                            st->ring.size());
        enqueue_frame_locked(s, c, OP_ACK, sid,
                             reinterpret_cast<const uint8_t*>(ack),
                             (size_t)alen);
      } else {
        c->push_done = 0;  // stale frame: drop any partial bookkeeping
      }
    } else if (opcode == OP_STREAM_START) {
      size_t plen = std::min((size_t)len, MAX_CTRL_PAYLOAD);
      s->control.push_back(ControlEvent{
          EV_START, c->id, 0, std::vector<uint8_t>(payload, payload + plen)});
      s->work = true;
    } else if (opcode == OP_STREAM_END) {
      s->control.push_back(ControlEvent{EV_END, c->id, sid, {}});
      s->work = true;
    } else if (opcode == OP_SET_LANG) {
      size_t plen = std::min((size_t)len, MAX_CTRL_PAYLOAD);
      s->control.push_back(ControlEvent{
          EV_SET_LANG, c->id, sid,
          std::vector<uint8_t>(payload, payload + plen)});
      s->work = true;
    } else {
      char msg[40];
      int mlen = snprintf(msg, sizeof(msg), "bad opcode %u", (unsigned)opcode);
      enqueue_frame_locked(s, c, OP_ERROR, sid,
                           reinterpret_cast<const uint8_t*>(msg), (size_t)mlen);
    }
    c->rpos += HEADER_SIZE + len;
  }
  if (c->rpos > 0 && c->rpos * 2 > c->rbuf.size()) {
    c->rbuf.erase(c->rbuf.begin(), c->rbuf.begin() + (ptrdiff_t)c->rpos);
    c->rpos = 0;
  }
  if (s->work) s->work_cv.notify_all();
  return true;
}

void io_loop(Server* s) {
  epoll_event events[128];
  char rd[1 << 16];
  while (!s->stop.load(std::memory_order_relaxed)) {
    int n = epoll_wait(s->epfd, events, 128, 200);
    if (n < 0) {
      if (errno == EINTR) continue;
      break;
    }
    std::unique_lock<std::mutex> lk(s->mu);
    for (int i = 0; i < n; i++) {
      uint64_t id = events[i].data.u64;
      if (id == 0) {  // listen fd
        for (;;) {
          int fd = accept(s->listen_fd, nullptr, nullptr);
          if (fd < 0) break;
          set_nonblock(fd);
          int one = 1;
          setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
          Conn* c = new Conn();
          c->fd = fd;
          c->id = s->next_conn_id++;
          s->conns[c->id] = c;
          epoll_event ev{};
          ev.events = EPOLLIN;
          ev.data.u64 = c->id;
          epoll_ctl(s->epfd, EPOLL_CTL_ADD, fd, &ev);
        }
        continue;
      }
      if (id == UINT64_MAX) {  // wake eventfd: drain + service kicks
        uint64_t v;
        ssize_t r = read(s->wake_fd, &v, sizeof(v));
        (void)r;
        continue;
      }
      auto it = s->conns.find(id);
      if (it == s->conns.end()) continue;
      Conn* c = it->second;
      bool dead = (events[i].events & (EPOLLHUP | EPOLLERR)) != 0;
      if (!dead && (events[i].events & EPOLLIN) && !c->parked) {
        for (;;) {
          ssize_t got = recv(c->fd, rd, sizeof(rd), MSG_DONTWAIT);
          if (got > 0) {
            c->rbuf.insert(c->rbuf.end(), rd, rd + got);
            if (!process_rbuf_locked(s, c)) { dead = true; break; }
            if (c->parked) break;
            if ((size_t)got < sizeof(rd)) break;
          } else if (got == 0) {
            dead = true;
            break;
          } else {
            if (errno != EAGAIN && errno != EWOULDBLOCK) dead = true;
            break;
          }
        }
      }
      if (!dead && (events[i].events & EPOLLOUT)) flush_writes_locked(s, c);
      if (dead) close_conn_locked(s, c);
    }
    // service kicks from the Python side: pending writes, unparks after a
    // budget release, parked frames that can now be consumed
    if (!s->any_parked) {
      // re-run frame processing for conns that were parked with a full
      // frame already buffered (unpark_all cleared the flags)
      for (auto it2 = s->conns.begin(); it2 != s->conns.end();) {
        Conn* c = it2->second;
        ++it2;
        if (!c->parked && c->rbuf.size() - c->rpos >= HEADER_SIZE) {
          if (!process_rbuf_locked(s, c)) close_conn_locked(s, c);
        }
      }
    }
    for (auto it2 = s->conns.begin(); it2 != s->conns.end();) {
      Conn* c = (it2++)->second;
      if (!c->wq.empty()) flush_writes_locked(s, c);
    }
  }
}

}  // namespace

extern "C" {

// Start the ingest server. If unix_path is non-empty binds a unix socket,
// else TCP on host:port (port 0 = ephemeral). Returns the bound TCP port
// (0 for unix), or -1 on error.
int64_t ingest_start(const char* host, int32_t port, const char* unix_path,
                     int64_t budget_bytes) {
  if (g_srv) return -1;
  Server* s = new Server();
  s->budget_bytes = budget_bytes;

  if (unix_path && unix_path[0]) {
    s->listen_fd = socket(AF_UNIX, SOCK_STREAM, 0);
    sockaddr_un addr{};
    addr.sun_family = AF_UNIX;
    std::strncpy(addr.sun_path, unix_path, sizeof(addr.sun_path) - 1);
    unlink(unix_path);
    if (bind(s->listen_fd, (sockaddr*)&addr, sizeof(addr)) < 0 ||
        listen(s->listen_fd, 512) < 0) {
      close(s->listen_fd);
      delete s;
      return -1;
    }
    s->unix_path = unix_path;
    port = 0;
  } else {
    s->listen_fd = socket(AF_INET, SOCK_STREAM, 0);
    int one = 1;
    setsockopt(s->listen_fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
    sockaddr_in addr{};
    addr.sin_family = AF_INET;
    addr.sin_port = htons((uint16_t)port);
    addr.sin_addr.s_addr = host && host[0] ? inet_addr(host) : INADDR_ANY;
    if (bind(s->listen_fd, (sockaddr*)&addr, sizeof(addr)) < 0 ||
        listen(s->listen_fd, 512) < 0) {
      close(s->listen_fd);
      delete s;
      return -1;
    }
    socklen_t alen = sizeof(addr);
    getsockname(s->listen_fd, (sockaddr*)&addr, &alen);
    port = ntohs(addr.sin_port);
  }
  set_nonblock(s->listen_fd);

  s->epfd = epoll_create1(0);
  s->wake_fd = eventfd(0, EFD_NONBLOCK);
  epoll_event ev{};
  ev.events = EPOLLIN;
  ev.data.u64 = 0;  // listen marker
  epoll_ctl(s->epfd, EPOLL_CTL_ADD, s->listen_fd, &ev);
  epoll_event wev{};
  wev.events = EPOLLIN;
  wev.data.u64 = UINT64_MAX;  // wake marker
  epoll_ctl(s->epfd, EPOLL_CTL_ADD, s->wake_fd, &wev);

  g_srv = s;
  s->io_thread = std::thread(io_loop, s);
  return port;
}

void ingest_stop() {
  Server* s = g_srv;
  if (!s) return;
  s->stop.store(true);
  kick_io(s);
  s->io_thread.join();
  {
    std::lock_guard<std::mutex> lk(s->mu);
    for (auto& [id, c] : s->conns) {
      close(c->fd);
      delete c;
    }
    s->conns.clear();
    for (auto& [sid, st] : s->streams) delete st;
    s->streams.clear();
  }
  close(s->listen_fd);
  close(s->epfd);
  close(s->wake_fd);
  if (!s->unix_path.empty()) unlink(s->unix_path.c_str());
  delete s;
  g_srv = nullptr;
}

// Block until ingest work (control event / new audio) or timeout_ms.
// Returns 1 if work was signaled, 0 on timeout. Called without the GIL
// (ctypes releases it), so the IO thread and the TPU never wait on us.
int32_t ingest_wait(int32_t timeout_ms) {
  Server* s = g_srv;
  if (!s) return 0;
  std::unique_lock<std::mutex> lk(s->mu);
  if (!s->work)
    s->work_cv.wait_for(lk, std::chrono::milliseconds(timeout_ms));
  int32_t had = s->work ? 1 : 0;
  s->work = false;
  return had;
}

// Drain up to max_events control events. Payload bytes are packed into
// payload_buf (cap payload_cap); events whose payload would overflow stay
// queued for the next poll. Returns the number of events written.
int64_t ingest_poll_control(uint8_t* types, uint64_t* conns, uint32_t* sids,
                            int64_t max_events, uint8_t* payload_buf,
                            int64_t payload_cap, int64_t* payload_offs,
                            int64_t* payload_lens) {
  Server* s = g_srv;
  if (!s) return 0;
  std::lock_guard<std::mutex> lk(s->mu);
  int64_t count = 0;
  int64_t off = 0;
  while (count < max_events && !s->control.empty()) {
    ControlEvent& e = s->control.front();
    int64_t plen = (int64_t)e.payload.size();
    // payloads are clamped to MAX_CTRL_PAYLOAD at enqueue; truncate anyway
    // rather than let an oversized head wedge the queue forever
    if (plen > payload_cap) plen = payload_cap;
    if (count > 0 && off + plen > payload_cap) break;
    types[count] = e.type;
    conns[count] = e.conn;
    sids[count] = e.sid;
    payload_offs[count] = off;
    payload_lens[count] = plen;
    if (plen) std::memcpy(payload_buf + off, e.payload.data(), (size_t)plen);
    off += plen;
    count++;
    s->control.pop_front();
  }
  return count;
}

// Bind a freshly-claimed stream id to its connection (PUSH/END routing).
void ingest_register_stream(uint64_t conn, uint32_t sid) {
  Server* s = g_srv;
  if (!s) return;
  std::lock_guard<std::mutex> lk(s->mu);
  auto it = s->conns.find(conn);
  if (it == s->conns.end()) {
    // connection died between START and the claim: tell Python to release
    s->control.push_back(ControlEvent{EV_DROP, conn, sid, {}});
    s->work = true;
    s->work_cv.notify_all();
    return;
  }
  Stream* st = new Stream();
  st->conn = conn;
  s->streams[sid] = st;
  it->second->sids.push_back(sid);
}

// Queue a frame toward the connection owning `conn`. Silently dropped if
// the connection is gone (matches the Python server's closed-writer sends).
void ingest_send(uint64_t conn, uint8_t opcode, uint32_t sid,
                 const uint8_t* payload, int64_t len) {
  Server* s = g_srv;
  if (!s) return;
  std::lock_guard<std::mutex> lk(s->mu);
  auto it = s->conns.find(conn);
  if (it == s->conns.end()) return;
  enqueue_frame_locked(s, it->second, opcode, sid, payload, (size_t)len);
  kick_io(s);
}

// Batched per-stream staging status for the engine tick.
void ingest_status(const uint32_t* sids, int64_t n, int64_t* staged,
                   uint64_t* total_pushed) {
  Server* s = g_srv;
  if (!s) {  // stopped: report every stream gone (callers pass np.empty)
    for (int64_t i = 0; i < n; i++) {
      staged[i] = -1;
      total_pushed[i] = 0;
    }
    return;
  }
  std::lock_guard<std::mutex> lk(s->mu);
  for (int64_t i = 0; i < n; i++) {
    auto it = s->streams.find(sids[i]);
    if (it == s->streams.end()) {
      staged[i] = -1;  // stream gone
      total_pushed[i] = 0;
    } else {
      staged[i] = (int64_t)it->second->ring.size();
      total_pushed[i] = it->second->total_pushed;
    }
  }
}

// Fill the engine's tick block: for each slot i with take_n[i] > 0, copy
// take_n[i] samples of stream sids[i] into out + i*row_stride (zero-filling
// any shortfall). Returns total samples copied. Frees admission budget and
// unparks blocked connections.
int64_t ingest_take_block(const uint32_t* sids, const int32_t* take_n,
                          int64_t n_slots, int64_t row_stride, int16_t* out) {
  Server* s = g_srv;
  if (!s) return 0;
  std::lock_guard<std::mutex> lk(s->mu);
  int64_t total = 0;
  for (int64_t i = 0; i < n_slots; i++) {
    if (take_n[i] <= 0) continue;
    auto it = s->streams.find(sids[i]);
    if (it == s->streams.end()) continue;
    total += (int64_t)it->second->ring.take(out + i * row_stride,
                                            (size_t)take_n[i]);
  }
  if (total > 0) {
    s->used_bytes -= total * (int64_t)sizeof(int16_t);
    if (s->any_parked) {
      unpark_all_locked(s);
      kick_io(s);
    }
  }
  return total;
}

// Release a stream's staging state (slot released / dropped).
void ingest_drop_stream(uint32_t sid) {
  Server* s = g_srv;
  if (!s) return;
  std::lock_guard<std::mutex> lk(s->mu);
  auto it = s->streams.find(sid);
  if (it == s->streams.end()) return;
  s->used_bytes -= (int64_t)(it->second->ring.size() * sizeof(int16_t));
  uint64_t conn = it->second->conn;
  delete it->second;
  s->streams.erase(it);
  auto cit = s->conns.find(conn);
  if (cit != s->conns.end()) {
    auto& v = cit->second->sids;
    for (size_t i = 0; i < v.size(); i++)
      if (v[i] == sid) {
        v.erase(v.begin() + (ptrdiff_t)i);
        break;
      }
  }
  if (s->any_parked) {
    unpark_all_locked(s);
    kick_io(s);
  }
}

}  // extern "C"
