// Native host-side sequence-compilation kernels.
//
// The hot host-side path of the framework is turning a pulse schedule into
// contiguous per-channel sample buffers (1 sample/ns) before the jitted
// device program runs.  For large scans (thousands of sequences, long
// schedules) the pure-Python path is allocation-bound; these kernels do the
// window generation, PCHIP interpolation and slot assembly in one pass.
//
// Exposed via a plain C ABI consumed with ctypes (no pybind11 in the
// image); every function writes into caller-allocated float64 buffers.

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Blackman window scaled so that sum(out) * 1e-3 == area.
void wf_blackman(int64_t n, double area, double* out) {
    if (n == 1) {
        out[0] = area * 1e3;
        return;
    }
    double sum = 0.0;
    const double c = 2.0 * M_PI / (double)(n - 1);
    for (int64_t k = 0; k < n; ++k) {
        double x = c * (double)k;
        double w = 0.42 - 0.5 * std::cos(x) + 0.08 * std::cos(2.0 * x);
        if (w < 0.0) w = 0.0;
        out[k] = w;
        sum += w;
    }
    const double scale = area / (sum * 1e-3);
    for (int64_t k = 0; k < n; ++k) out[k] *= scale;
}

static double bessel_i0(double x) {
    // series expansion; converges fast for the beta range used here
    double s = 1.0, t = 1.0;
    const double x2 = x * x / 4.0;
    for (int k = 1; k < 64; ++k) {
        t *= x2 / (double)(k * k);
        s += t;
        if (t < 1e-18 * s) break;
    }
    return s;
}

// Kaiser window scaled so that sum(out) * 1e-3 == area.
void wf_kaiser(int64_t n, double area, double beta, double* out) {
    if (n == 1) {
        out[0] = area * 1e3;
        return;
    }
    const double denom = bessel_i0(beta);
    double sum = 0.0;
    for (int64_t k = 0; k < n; ++k) {
        double r = 2.0 * (double)k / (double)(n - 1) - 1.0;
        double arg = 1.0 - r * r;
        if (arg < 0.0) arg = 0.0;
        double w = bessel_i0(beta * std::sqrt(arg)) / denom;
        out[k] = w;
        sum += w;
    }
    const double scale = area / (sum * 1e-3);
    for (int64_t k = 0; k < n; ++k) out[k] *= scale;
}

void wf_ramp(int64_t n, double start, double stop, double* out) {
    const double denom = (n > 1) ? (double)(n - 1) : 1.0;
    for (int64_t k = 0; k < n; ++k)
        out[k] = start + (stop - start) * ((double)k / denom);
}

// PCHIP (Fritsch–Carlson monotone cubic), matching
// scipy.interpolate.PchipInterpolator's derivative rules.
// x: (np) strictly increasing knots; y: (np) values;
// t: (nt) query points; out: (nt).
void wf_pchip(int64_t npts, const double* x, const double* y, int64_t nt,
              const double* t, double* out) {
    if (npts == 1) {
        for (int64_t i = 0; i < nt; ++i) out[i] = y[0];
        return;
    }
    const int64_t ns = npts - 1;
    double* h = new double[ns];
    double* m = new double[ns];
    double* d = new double[npts];
    for (int64_t i = 0; i < ns; ++i) {
        h[i] = x[i + 1] - x[i];
        m[i] = (y[i + 1] - y[i]) / h[i];
    }
    if (npts == 2) {
        d[0] = d[1] = m[0];
    } else {
        for (int64_t i = 1; i < ns; ++i) {
            if (m[i - 1] * m[i] > 0.0) {
                double w1 = 2.0 * h[i] + h[i - 1];
                double w2 = h[i] + 2.0 * h[i - 1];
                d[i] = (w1 + w2) / (w1 / m[i - 1] + w2 / m[i]);
            } else {
                d[i] = 0.0;
            }
        }
        auto edge = [](double h0, double h1, double m0, double m1) {
            double d0 = ((2.0 * h0 + h1) * m0 - h0 * m1) / (h0 + h1);
            if (d0 * m0 <= 0.0 && d0 != 0.0) d0 = 0.0;
            else if (m0 * m1 < 0.0 && std::fabs(d0) > 3.0 * std::fabs(m0))
                d0 = 3.0 * m0;
            if (m0 == 0.0) d0 = 0.0;
            return d0;
        };
        d[0] = edge(h[0], h[1], m[0], m[1]);
        d[npts - 1] = edge(h[ns - 1], h[ns - 2], m[ns - 1], m[ns - 2]);
    }
    int64_t k = 0;
    for (int64_t i = 0; i < nt; ++i) {
        double ti = t[i];
        while (k + 1 < ns && ti >= x[k + 1]) ++k;
        while (k > 0 && ti < x[k]) --k;
        double s = (ti - x[k]) / h[k];
        double s2 = s * s;
        double h00 = (1.0 + 2.0 * s) * (1.0 - s) * (1.0 - s);
        double h10 = s * (1.0 - s) * (1.0 - s);
        double h01 = s2 * (3.0 - 2.0 * s);
        double h11 = s2 * (s - 1.0);
        out[i] = h00 * y[k] + h10 * h[k] * d[k] + h01 * y[k + 1] +
                 h11 * h[k] * d[k + 1];
    }
    delete[] h;
    delete[] m;
    delete[] d;
}

// Assemble one channel's (amp, det, phase) buffers from slot segments.
// For each slot s: copy seg_amp/seg_det into [ti, tf), set phase, with
// forward-fill of phase across gaps.  Buffers must be zero-initialised by
// the caller and have length total.
void assemble_channel(int64_t total, int64_t n_slots, const int64_t* ti,
                      const int64_t* tf, const double* seg_amp,
                      const double* seg_det, const double* seg_phase,
                      double* amp, double* det, double* phase) {
    int64_t seg_off = 0;
    double last_phase = 0.0;
    int64_t cursor = 0;
    for (int64_t s = 0; s < n_slots; ++s) {
        // forward-fill phase over the gap
        for (int64_t k = cursor; k < ti[s] && k < total; ++k)
            phase[k] = last_phase;
        int64_t len = tf[s] - ti[s];
        for (int64_t k = 0; k < len; ++k) {
            int64_t p = ti[s] + k;
            if (p >= total) break;
            amp[p] = seg_amp[seg_off + k];
            det[p] = seg_det[seg_off + k];
            phase[p] = seg_phase[s];
        }
        last_phase = seg_phase[s];
        seg_off += len;
        cursor = tf[s];
    }
    for (int64_t k = cursor; k < total; ++k) phase[k] = last_phase;
}

}  // extern "C"
