// ti5_infer — native deployment inference runtime for exported T1 policies.
//
// Plays the role of the reference's on-robot MNN stack (the reference ships a
// prebuilt MNNConvert binary and converts TorchScript->ONNX->MNN for its
// robot-side controller; see reference scripts/export_mnn_t1.py).  Here the
// exported artifact is the framework's own .npz weight archive
// (ti5_isaacgym_tpu.export.policy.export_npz) and this runtime implements the
// ActorCriticDH inference graph directly:
//
//   obs[3102] -> short history[235] -> estimator MLP -> est_vel[3]
//             -> conv1d(66ch x 47) k6s3 + k4s2 -> 96 -> 128 -> emb[64]
//   actor([short | est_vel | emb]) -> action mean[12]
//
// Build:   g++ -O2 -std=c++17 -o ti5_infer ti5_infer.cc
// Usage:   ti5_infer policy.npz obs.txt          # one obs per line -> stdout
//          ti5_infer policy.npz --bench [iters]  # latency benchmark
//          ti5_infer policy.npz --selftest       # zero-obs forward
#include <cstdint>
#include <cstring>
#include <chrono>
#include <cmath>
#include <fstream>
#include <iostream>
#include <map>
#include <sstream>
#include <stdexcept>
#include <string>
#include <vector>

namespace {

struct Tensor {
  std::vector<int> shape;
  std::vector<float> data;
  int64_t size() const {
    int64_t n = 1;
    for (int d : shape) n *= d;
    return n;
  }
};

// ---------------------------------------------------------------------------
// Minimal NPZ (ZIP_STORED) + NPY reader — numpy's savez writes uncompressed
// entries, so only local-file-header parsing is needed.
// ---------------------------------------------------------------------------

uint32_t rd32(const uint8_t* p) {
  return p[0] | (p[1] << 8) | (p[2] << 16) | (uint32_t(p[3]) << 24);
}
uint16_t rd16(const uint8_t* p) { return p[0] | (p[1] << 8); }

Tensor parse_npy(const uint8_t* buf, size_t len) {
  if (len < 10 || std::memcmp(buf, "\x93NUMPY", 6) != 0)
    throw std::runtime_error("bad npy magic");
  uint16_t hlen = rd16(buf + 8);
  std::string header(reinterpret_cast<const char*>(buf + 10), hlen);
  if (header.find("'descr': '<f4'") == std::string::npos)
    throw std::runtime_error("expect float32 tensors, got: " + header);
  if (header.find("'fortran_order': False") == std::string::npos)
    throw std::runtime_error("expect C-order tensors");
  Tensor t;
  auto a = header.find('('), b = header.find(')');
  std::string dims = header.substr(a + 1, b - a - 1);
  std::stringstream ss(dims);
  std::string item;
  while (std::getline(ss, item, ',')) {
    item.erase(0, item.find_first_not_of(" \t"));
    if (!item.empty()) t.shape.push_back(std::stoi(item));
  }
  if (t.shape.empty()) t.shape.push_back(1);
  const float* fp = reinterpret_cast<const float*>(buf + 10 + hlen);
  t.data.assign(fp, fp + t.size());
  return t;
}

std::map<std::string, Tensor> load_npz(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) throw std::runtime_error("cannot open " + path);
  std::vector<uint8_t> buf((std::istreambuf_iterator<char>(f)),
                           std::istreambuf_iterator<char>());
  std::map<std::string, Tensor> out;
  size_t off = 0;
  while (off + 30 <= buf.size() && rd32(&buf[off]) == 0x04034b50) {
    uint16_t method = rd16(&buf[off + 8]);
    uint64_t csize = rd32(&buf[off + 18]);
    uint64_t usize = rd32(&buf[off + 22]);
    uint16_t nlen = rd16(&buf[off + 26]);
    uint16_t elen = rd16(&buf[off + 28]);
    std::string name(reinterpret_cast<char*>(&buf[off + 30]), nlen);
    // zip64: 0xFFFFFFFF sentinels put the true sizes in extra field 0x0001
    if (csize == 0xFFFFFFFFu || usize == 0xFFFFFFFFu) {
      size_t e = off + 30 + nlen, eend = e + elen;
      while (e + 4 <= eend) {
        uint16_t tag = rd16(&buf[e]), tlen = rd16(&buf[e + 2]);
        if (tag == 0x0001) {
          size_t p = e + 4;
          if (usize == 0xFFFFFFFFu) {
            usize = *reinterpret_cast<const uint64_t*>(&buf[p]);
            p += 8;
          }
          if (csize == 0xFFFFFFFFu)
            csize = *reinterpret_cast<const uint64_t*>(&buf[p]);
          break;
        }
        e += 4 + tlen;
      }
    }
    size_t data_off = off + 30 + nlen + elen;
    if (method != 0) throw std::runtime_error("compressed npz not supported: " + name);
    if (name.size() > 4 && name.substr(name.size() - 4) == ".npy")
      out[name.substr(0, name.size() - 4)] = parse_npy(&buf[data_off], csize);
    off = data_off + csize;
  }
  if (out.empty()) throw std::runtime_error("no tensors in " + path);
  return out;
}

// ---------------------------------------------------------------------------
// Ops
// ---------------------------------------------------------------------------

void dense(const Tensor& kernel, const Tensor& bias, const std::vector<float>& x,
           std::vector<float>& y) {
  int in = kernel.shape[0], out = kernel.shape[1];
  y.assign(out, 0.f);
  for (int i = 0; i < in; ++i) {
    float xi = x[i];
    const float* row = &kernel.data[size_t(i) * out];
    for (int o = 0; o < out; ++o) y[o] += xi * row[o];
  }
  for (int o = 0; o < out; ++o) y[o] += bias.data[o];
}

void elu(std::vector<float>& x) {
  for (auto& v : x) v = v > 0 ? v : std::expm1(v);
}
void relu(std::vector<float>& x) {
  for (auto& v : x) v = v > 0 ? v : 0.f;
}

// valid conv1d on [len, cin] with flax kernel [k, cin, cout] -> [lout, cout]
void conv1d(const Tensor& kernel, const Tensor& bias, const std::vector<float>& x,
            int len, int cin, int stride, std::vector<float>& y, int& lout) {
  int k = kernel.shape[0], cout = kernel.shape[2];
  lout = (len - k) / stride + 1;
  y.assign(size_t(lout) * cout, 0.f);
  for (int l = 0; l < lout; ++l) {
    float* yrow = &y[size_t(l) * cout];
    for (int ki = 0; ki < k; ++ki) {
      const float* xrow = &x[size_t(l * stride + ki) * cin];
      const float* krow = &kernel.data[size_t(ki) * cin * cout];
      for (int c = 0; c < cin; ++c) {
        float xv = xrow[c];
        const float* kr = &krow[size_t(c) * cout];
        for (int o = 0; o < cout; ++o) yrow[o] += xv * kr[o];
      }
    }
    for (int o = 0; o < cout; ++o) yrow[o] += bias.data[o];
  }
}

struct Policy {
  std::map<std::string, Tensor> w;
  static constexpr int kObs = 66 * 47, kShort = 235, kFrame = 47, kStack = 66;

  const Tensor& t(const std::string& name) const {
    auto it = w.find(name);
    if (it == w.end()) throw std::runtime_error("missing tensor " + name);
    return it->second;
  }

  void mlp(const std::string& prefix, std::vector<float>& x) const {
    for (int i = 0;; ++i) {
      std::string base = prefix + "/Dense_" + std::to_string(i);
      if (!w.count(base + "/kernel")) break;
      std::vector<float> y;
      dense(t(base + "/kernel"), t(base + "/bias"), x, y);
      x.swap(y);
      // hidden layers use ELU; the final layer (no successor) is linear
      if (w.count(prefix + "/Dense_" + std::to_string(i + 1) + "/kernel")) elu(x);
    }
  }

  // returns (action_mean[12], est_vel[3])
  void infer(const std::vector<float>& obs, std::vector<float>& action,
             std::vector<float>& est_vel) const {
    if ((int)obs.size() != kObs) throw std::runtime_error("obs must be 3102-dim");
    // short history = newest 5 frames
    std::vector<float> shortv(obs.end() - kShort, obs.end());
    est_vel = shortv;
    mlp("state_estimator", est_vel);
    // long-history CNN: frames-as-channels -> [47 len, 66 ch]
    std::vector<float> x(size_t(kFrame) * kStack);
    for (int fr = 0; fr < kStack; ++fr)
      for (int c = 0; c < kFrame; ++c)
        x[size_t(c) * kStack + fr] = obs[size_t(fr) * kFrame + c];
    std::vector<float> y;
    int lout = 0;
    conv1d(t("long_history/Conv_0/kernel"), t("long_history/Conv_0/bias"), x,
           kFrame, kStack, 3, y, lout);
    relu(y);
    std::vector<float> y2;
    conv1d(t("long_history/Conv_1/kernel"), t("long_history/Conv_1/bias"), y,
           lout, t("long_history/Conv_0/kernel").shape[2], 2, y2, lout);
    relu(y2);
    mlp("long_history", y2);  // Dense_0 (128, elu) -> Dense_1 (64)
    // actor input = [short | est_vel | emb]
    std::vector<float> a;
    a.reserve(kShort + 3 + y2.size());
    a.insert(a.end(), shortv.begin(), shortv.end());
    a.insert(a.end(), est_vel.begin(), est_vel.end());
    a.insert(a.end(), y2.begin(), y2.end());
    action = a;
    mlp("actor", action);
  }
};

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    std::cerr << "usage: " << argv[0]
              << " policy.npz (obs.txt | --bench [iters] | --selftest)\n";
    return 2;
  }
  try {
    Policy p;
    p.w = load_npz(argv[1]);
    std::string mode = argv[2];
    std::vector<float> obs(Policy::kObs, 0.f), action, est;
    if (mode == "--selftest") {
      p.infer(obs, action, est);
      std::cout << "action:";
      for (float v : action) std::cout << " " << v;
      std::cout << "\nest_vel:";
      for (float v : est) std::cout << " " << v;
      std::cout << "\n";
      return 0;
    }
    if (mode == "--bench") {
      int iters = argc > 3 ? std::atoi(argv[3]) : 1000;
      for (auto& v : obs) v = 0.01f;
      auto t0 = std::chrono::steady_clock::now();
      for (int i = 0; i < iters; ++i) p.infer(obs, action, est);
      auto dt = std::chrono::duration<double>(
                    std::chrono::steady_clock::now() - t0).count();
      std::cout << "latency: " << dt / iters * 1e6 << " us/inference ("
                << iters / dt << " Hz)\n";
      return 0;
    }
    std::ifstream f(mode);
    if (!f) throw std::runtime_error("cannot open obs file " + mode);
    std::string line;
    while (std::getline(f, line)) {
      std::stringstream ss(line);
      obs.clear();
      float v;
      while (ss >> v) obs.push_back(v);
      if (obs.empty()) continue;
      p.infer(obs, action, est);
      for (size_t i = 0; i < action.size(); ++i)
        std::cout << (i ? " " : "") << action[i];
      for (size_t i = 0; i < est.size(); ++i) std::cout << " " << est[i];
      std::cout << "\n";
    }
    return 0;
  } catch (const std::exception& e) {
    std::cerr << "error: " << e.what() << "\n";
    return 1;
  }
}
