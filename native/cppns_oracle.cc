// Independent C++ oracle for cross-language validation of the framework's
// hardest numerics.  Built as a shared library (native/build.sh) and loaded
// via ctypes (cppnumericalsolvers_tpu/utils/native.py).
//
// Two oracles:
//  1. cstep_oracle — the MINPACK `cstep` safeguarded cubic/quadratic
//     trial-step interpolation (More & Thuente 1994, ACM TOMS 20(3)),
//     written here directly from the published algorithm.  The test suite
//     compares it element-for-element against the JAX implementation in
//     linesearch/more_thuente.py (whose port provenance is the reference's
//     more_thuente.h:261-407).
//  2. mgh_eval — value + hand-derived analytic gradients for a subset of the
//     More-Garbow-Hillstrom functions, checked against jax.grad of the
//     models/suite.py objectives.
//
// Everything is plain C ABI so ctypes needs no binding generator.

#include <algorithm>
#include <cmath>
#include <cstring>

namespace {

inline double max3(double a, double b, double c) {
  return std::max(a, std::max(b, c));
}

}  // namespace

extern "C" {

// MINPACK cstep.  In/out scalars mirror the Fortran subroutine signature:
//   stx, fx, dx : best step / value / directional derivative
//   sty, fy, dy : other endpoint
//   stp, fp, dp : current trial
//   brackt      : (in/out) whether the minimum is bracketed
//   stpmin/max  : step bounds
// Returns info in {0 (input error), 1..4 (interpolation case taken)}.
int cstep_oracle(double* stx, double* fx, double* dx, double* sty, double* fy,
                 double* dy, double* stp, double fp, double dp, int* brackt,
                 double stpmin, double stpmax) {
  int info = 0;
  const bool bad_bracket =
      *brackt && (*stp <= std::min(*stx, *sty) || *stp >= std::max(*stx, *sty));
  if (bad_bracket || *dx * (*stp - *stx) >= 0.0 || stpmax < stpmin) {
    return 0;
  }

  const double sgnd = dp * (*dx / std::fabs(*dx));
  bool bound;
  double stpf;

  if (fp > *fx) {
    // Case 1: higher function value — minimum bracketed between stx and stp.
    info = 1;
    bound = true;
    const double theta = 3.0 * (*fx - fp) / (*stp - *stx) + *dx + dp;
    const double s = max3(std::fabs(theta), std::fabs(*dx), std::fabs(dp));
    double gamma =
        s * std::sqrt((theta / s) * (theta / s) - (*dx / s) * (dp / s));
    if (*stp < *stx) gamma = -gamma;
    const double p = (gamma - *dx) + theta;
    const double q = ((gamma - *dx) + gamma) + dp;
    const double r = p / q;
    const double stpc = *stx + r * (*stp - *stx);
    const double stpq =
        *stx + ((*dx / ((*fx - fp) / (*stp - *stx) + *dx)) / 2.0) *
                   (*stp - *stx);
    stpf = (std::fabs(stpc - *stx) < std::fabs(stpq - *stx))
               ? stpc
               : stpc + (stpq - stpc) / 2.0;
    *brackt = 1;
  } else if (sgnd < 0.0) {
    // Case 2: derivatives of opposite sign — minimum bracketed.
    info = 2;
    bound = false;
    const double theta = 3.0 * (*fx - fp) / (*stp - *stx) + *dx + dp;
    const double s = max3(std::fabs(theta), std::fabs(*dx), std::fabs(dp));
    double gamma =
        s * std::sqrt((theta / s) * (theta / s) - (*dx / s) * (dp / s));
    if (*stp > *stx) gamma = -gamma;
    const double p = (gamma - dp) + theta;
    const double q = ((gamma - dp) + gamma) + *dx;
    const double r = p / q;
    const double stpc = *stp + r * (*stx - *stp);
    const double stpq = *stp + (dp / (dp - *dx)) * (*stx - *stp);
    stpf = (std::fabs(stpc - *stp) > std::fabs(stpq - *stp)) ? stpc : stpq;
    *brackt = 1;
  } else if (std::fabs(dp) < std::fabs(*dx)) {
    // Case 3: derivative magnitude decreases — cubic may have no minimizer
    // in the step direction; safeguard toward stpmax/stpmin.
    info = 3;
    bound = true;
    const double theta = 3.0 * (*fx - fp) / (*stp - *stx) + *dx + dp;
    const double s = max3(std::fabs(theta), std::fabs(*dx), std::fabs(dp));
    double gamma = s * std::sqrt(std::max(
                           0.0, (theta / s) * (theta / s) - (*dx / s) * (dp / s)));
    if (*stp > *stx) gamma = -gamma;
    const double p = (gamma - dp) + theta;
    const double q = (gamma + (*dx - dp)) + gamma;
    const double r = p / q;
    double stpc;
    if (r < 0.0 && gamma != 0.0) {
      stpc = *stp + r * (*stx - *stp);
    } else if (*stp > *stx) {
      stpc = stpmax;
    } else {
      stpc = stpmin;
    }
    const double stpq = *stp + (dp / (dp - *dx)) * (*stx - *stp);
    if (*brackt) {
      stpf = (std::fabs(*stp - stpc) < std::fabs(*stp - stpq)) ? stpc : stpq;
    } else {
      stpf = (std::fabs(*stp - stpc) > std::fabs(*stp - stpq)) ? stpc : stpq;
    }
  } else {
    // Case 4: derivative does not decrease in magnitude.
    info = 4;
    bound = false;
    if (*brackt) {
      const double theta = 3.0 * (fp - *fy) / (*sty - *stp) + *dy + dp;
      const double s = max3(std::fabs(theta), std::fabs(*dy), std::fabs(dp));
      double gamma =
          s * std::sqrt((theta / s) * (theta / s) - (*dy / s) * (dp / s));
      if (*stp > *sty) gamma = -gamma;
      const double p = (gamma - dp) + theta;
      const double q = ((gamma - dp) + gamma) + *dy;
      const double r = p / q;
      stpf = *stp + r * (*sty - *stp);
    } else if (*stp > *stx) {
      stpf = stpmax;
    } else {
      stpf = stpmin;
    }
  }

  // Update the interval of uncertainty.
  if (fp > *fx) {
    *sty = *stp;
    *fy = fp;
    *dy = dp;
  } else {
    if (sgnd < 0.0) {
      *sty = *stx;
      *fy = *fx;
      *dy = *dx;
    }
    *stx = *stp;
    *fx = fp;
    *dx = dp;
  }

  // Safeguarded new step.
  stpf = std::min(stpmax, stpf);
  stpf = std::max(stpmin, stpf);
  *stp = stpf;
  if (*brackt && bound) {
    if (*sty > *stx) {
      *stp = std::min(*stx + 0.66 * (*sty - *stx), *stp);
    } else {
      *stp = std::max(*stx + 0.66 * (*sty - *stx), *stp);
    }
  }
  return info;
}

// ---------------------------------------------------------------------------
// MGH value + analytic gradient oracles (hand-derived, independent of both
// the JAX objectives and autodiff).  Problem ids:
//   0 rosenbrock(2)   1 beale(2)   2 helical_valley(3)
//   3 powell_singular(4)   4 wood(4)   5 freudenstein_roth(2)
// Returns 0 on success, -1 on unknown id / wrong n.
int mgh_eval(int problem_id, const double* x, int n, double* f, double* g) {
  switch (problem_id) {
    case 0: {  // Rosenbrock: 100(x1-x0^2)^2 + (1-x0)^2
      if (n != 2) return -1;
      const double a = x[1] - x[0] * x[0];
      const double b = 1.0 - x[0];
      *f = 100.0 * a * a + b * b;
      g[0] = -400.0 * a * x[0] - 2.0 * b;
      g[1] = 200.0 * a;
      return 0;
    }
    case 1: {  // Beale
      if (n != 2) return -1;
      const double y1 = 1.5, y2 = 2.25, y3 = 2.625;
      const double u = x[1];
      const double r1 = y1 - x[0] * (1.0 - u);
      const double r2 = y2 - x[0] * (1.0 - u * u);
      const double r3 = y3 - x[0] * (1.0 - u * u * u);
      *f = r1 * r1 + r2 * r2 + r3 * r3;
      g[0] = 2.0 * (r1 * (u - 1.0) + r2 * (u * u - 1.0) + r3 * (u * u * u - 1.0));
      g[1] = 2.0 * (r1 * x[0] + r2 * x[0] * 2.0 * u + r3 * x[0] * 3.0 * u * u);
      return 0;
    }
    case 2: {  // Helical valley
      if (n != 3) return -1;
      const double pi = 3.14159265358979323846;
      const double theta = std::atan2(x[1], x[0]) / (2.0 * pi);
      const double rho = std::sqrt(x[0] * x[0] + x[1] * x[1]);
      const double r1 = 10.0 * (x[2] - 10.0 * theta);
      const double r2 = 10.0 * (rho - 1.0);
      *f = r1 * r1 + r2 * r2 + x[2] * x[2];
      const double denom = x[0] * x[0] + x[1] * x[1];
      // d theta/dx0 = -x1 / (2 pi denom); d theta/dx1 = x0 / (2 pi denom)
      const double dt0 = -x[1] / (2.0 * pi * denom);
      const double dt1 = x[0] / (2.0 * pi * denom);
      g[0] = 2.0 * r1 * (-100.0 * dt0) + 2.0 * r2 * 10.0 * (x[0] / rho);
      g[1] = 2.0 * r1 * (-100.0 * dt1) + 2.0 * r2 * 10.0 * (x[1] / rho);
      g[2] = 2.0 * r1 * 10.0 + 2.0 * x[2];
      return 0;
    }
    case 3: {  // Powell singular
      if (n != 4) return -1;
      const double r1 = x[0] + 10.0 * x[1];
      const double r2 = std::sqrt(5.0) * (x[2] - x[3]);
      const double r3 = (x[1] - 2.0 * x[2]) * (x[1] - 2.0 * x[2]);
      const double r4 = std::sqrt(10.0) * (x[0] - x[3]) * (x[0] - x[3]);
      *f = r1 * r1 + r2 * r2 + r3 * r3 + r4 * r4;
      const double t3 = x[1] - 2.0 * x[2];
      const double t4 = x[0] - x[3];
      g[0] = 2.0 * r1 + 4.0 * std::sqrt(10.0) * r4 * t4;
      g[1] = 20.0 * r1 + 4.0 * r3 * t3;
      g[2] = 2.0 * std::sqrt(5.0) * r2 - 8.0 * r3 * t3;
      g[3] = -2.0 * std::sqrt(5.0) * r2 - 4.0 * std::sqrt(10.0) * r4 * t4;
      return 0;
    }
    case 4: {  // Wood
      if (n != 4) return -1;
      const double r1 = 10.0 * (x[1] - x[0] * x[0]);
      const double r2 = 1.0 - x[0];
      const double r3 = std::sqrt(90.0) * (x[3] - x[2] * x[2]);
      const double r4 = 1.0 - x[2];
      const double r5 = std::sqrt(10.0) * (x[1] + x[3] - 2.0);
      const double r6 = (x[1] - x[3]) / std::sqrt(10.0);
      *f = r1 * r1 + r2 * r2 + r3 * r3 + r4 * r4 + r5 * r5 + r6 * r6;
      g[0] = -40.0 * r1 * x[0] - 2.0 * r2;
      g[1] = 20.0 * r1 + 2.0 * std::sqrt(10.0) * r5 + 2.0 * r6 / std::sqrt(10.0);
      // d r3/d x2 = -2 sqrt(90) x2, d r4/d x2 = -1
      g[2] = -4.0 * std::sqrt(90.0) * x[2] * r3 - 2.0 * r4;
      g[3] = 2.0 * std::sqrt(90.0) * r3 + 2.0 * std::sqrt(10.0) * r5 -
             2.0 * r6 / std::sqrt(10.0);
      return 0;
    }
    case 5: {  // Freudenstein & Roth
      if (n != 2) return -1;
      const double u = x[1];
      const double r1 = -13.0 + x[0] + ((5.0 - u) * u - 2.0) * u;
      const double r2 = -29.0 + x[0] + ((u + 1.0) * u - 14.0) * u;
      *f = r1 * r1 + r2 * r2;
      const double dr1_du = 10.0 * u - 3.0 * u * u - 2.0;
      const double dr2_du = 3.0 * u * u + 2.0 * u - 14.0;
      g[0] = 2.0 * (r1 + r2);
      g[1] = 2.0 * (r1 * dr1_du + r2 * dr2_du);
      return 0;
    }
    default:
      return -1;
  }
}

}  // extern "C"
