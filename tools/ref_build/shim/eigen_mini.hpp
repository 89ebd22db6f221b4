// Minimal Eigen API-surface shim: just enough to compile and run the
// UNMODIFIED reference DIS sources (/root/reference/src) on Linux for
// parity and baseline measurement.  Eigen itself is not installed in
// this image; the reference uses it only as a pointer carrier
// (Map<MatrixXf>, patch_grid.hpp:37-38), small fixed vectors, dynamic
// float columns with cwise products (patch.cpp:82-84,171-172), and one
// 2x2 partial-pivot LU solve (patch.cpp:176).  This header implements
// exactly that surface with the same numerics (serial reductions,
// unguarded divisions, strict-greater row pivoting).
#pragma once

#include <array>
#include <cmath>
#include <cstddef>
#include <type_traits>
#include <vector>

namespace Eigen {

const int Dynamic = -1;

// Lazy elementwise product: (a.array() * b.array()).sum()
template <typename T>
struct CwiseMul {
    const T* a;
    const T* b;
    long n;
    T sum() const {
        T s = T(0);
        for (long i = 0; i < n; ++i) s += a[i] * b[i];
        return s;
    }
};

// View returned by .array(); supports * (cwise) and -= scalar.
template <typename T>
struct ArrayRef {
    T* p;
    long n;
    CwiseMul<T> operator*(ArrayRef o) const { return {p, o.p, n}; }
    void operator-=(T s) const {
        for (long i = 0; i < n; ++i) p[i] -= s;
    }
};

template <typename T, int R, int C>
class Matrix;

// 2x2 partial-pivot LU, the same elimination order as Eigen's
// PartialPivLU (strictly-greater pivot test, no singularity guards —
// the reference pre-guards det==0 itself, patch.cpp:86-90).
template <typename T>
struct Lu2 {
    T a00, a10, a01, a11;  // column-major entries of the factored matrix
    Matrix<T, 2, 1> solve(const Matrix<T, 2, 1>& b) const;
};

template <typename T, int R, int C>
class Matrix {
public:
    using Scalar = T;
    static const bool kFixed = (R != Dynamic && C != Dynamic);

private:
    static const std::size_t kFixedN =
        kFixed ? std::size_t(R > 0 ? R : 1) * std::size_t(C > 0 ? C : 1) : 1;
    using Store = typename std::conditional<
        kFixed, std::array<T, kFixedN>, std::vector<T>>::type;
    Store d_;

public:
    Matrix() : d_() {}  // fixed: zero-init (safe superset of Eigen)

    void resize(long r, long c) {  // only reached on dynamic matrices
        if constexpr (!kFixed)
            d_.assign(static_cast<std::size_t>(r * c), T(0));
        else
            (void)r, (void)c;
    }

    T* data() { return d_.data(); }
    const T* data() const { return d_.data(); }
    long size() const { return static_cast<long>(d_.size()); }

    T& operator[](long i) { return d_[i]; }
    const T& operator[](long i) const { return d_[i]; }
    T& operator()(long i) { return d_[i]; }
    const T& operator()(long i) const { return d_[i]; }
    // (i, j): column-major like Eigen (only used on the 2x2 Hessian)
    T& operator()(long i, long j) { return d_[i + j * (R > 0 ? R : 1)]; }
    const T& operator()(long i, long j) const {
        return d_[i + j * (R > 0 ? R : 1)];
    }

    void setZero() {
        for (std::size_t i = 0; i < d_.size(); ++i) d_[i] = T(0);
    }

    T sum() const {
        T s = T(0);
        for (std::size_t i = 0; i < d_.size(); ++i) s += d_[i];
        return s;
    }

    T norm() const {  // Eigen: sqrt(squaredNorm()) in T precision
        T s = T(0);
        for (std::size_t i = 0; i < d_.size(); ++i) s += d_[i] * d_[i];
        return std::sqrt(s);
    }

    ArrayRef<T> array() { return {d_.data(), size()}; }
    ArrayRef<const T> array() const { return {d_.data(), size()}; }

    Matrix operator+(const Matrix& o) const {
        Matrix m(*this);
        for (std::size_t i = 0; i < d_.size(); ++i) m.d_[i] += o.d_[i];
        return m;
    }
    Matrix operator-(const Matrix& o) const {
        Matrix m(*this);
        for (std::size_t i = 0; i < d_.size(); ++i) m.d_[i] -= o.d_[i];
        return m;
    }
    Matrix operator*(T s) const {
        Matrix m(*this);
        for (std::size_t i = 0; i < d_.size(); ++i) m.d_[i] *= s;
        return m;
    }

    T determinant() const {  // 2x2 only (patch.cpp:86)
        return d_[0] * d_[3] - d_[1] * d_[2];
    }

    Lu2<T> lu() const { return {d_[0], d_[1], d_[2], d_[3]}; }
};

template <typename T>
Matrix<T, 2, 1> Lu2<T>::solve(const Matrix<T, 2, 1>& b) const {
    T m00 = a00, m10 = a10, m01 = a01, m11 = a11;
    T b0 = b[0], b1 = b[1];
    if (std::abs(m10) > std::abs(m00)) {  // row pivot, strict greater
        T t;
        t = m00; m00 = m10; m10 = t;
        t = m01; m01 = m11; m11 = t;
        t = b0;  b0 = b1;   b1 = t;
    }
    T l = m10 / m00;
    T u11 = m11 - l * m01;
    T y1 = b1 - l * b0;
    Matrix<T, 2, 1> x;
    x[1] = y1 / u11;
    x[0] = (b0 - m01 * x[1]) / m00;
    return x;
}

typedef Matrix<float, Dynamic, Dynamic> MatrixXf;
typedef Matrix<float, 2, 1> Vector2f;
typedef Matrix<int, 2, 1> Vector2i;
typedef Matrix<float, 4, 1> Vector4f;

// Pointer carrier; the reference reads only .data()[linear_idx]
// (patch.cpp:66-70, 250-258).
template <typename M>
class Map {
    typename M::Scalar* p_;
    long rows_, cols_;

public:
    Map(typename M::Scalar* p, long rows, long cols)
        : p_(p), rows_(rows), cols_(cols) {}
    typename M::Scalar* data() const { return p_; }
    long rows() const { return rows_; }
    long cols() const { return cols_; }
};

}  // namespace Eigen
