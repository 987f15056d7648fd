import numpy as np

from raytracer_tpu.core.vec import as_complex3, as_float3, rgb, vec3


def test_arithmetic():
    a = vec3(1.0, 2.0, 3.0)
    b = vec3(4.0, 5.0, 6.0)
    assert (a + b).components() == (5.0, 7.0, 9.0)
    assert (b - a).components() == (3.0, 3.0, 3.0)
    assert (a * 2).components() == (2.0, 4.0, 6.0)
    assert (2 * a).components() == (2.0, 4.0, 6.0)
    assert (a * b).components() == (4.0, 10.0, 18.0)
    assert (b / 2).components() == (2.0, 2.5, 3.0)
    assert (a ** 2).components() == (1.0, 4.0, 9.0)
    assert (-a).components() == (-1.0, -2.0, -3.0)


def test_dot_cross_norm():
    a = vec3(1.0, 0.0, 0.0)
    b = vec3(0.0, 1.0, 0.0)
    assert a.dot(b) == 0.0
    c = a.cross(b)
    assert c.components() == (0.0, 0.0, 1.0)
    v = vec3(3.0, 4.0, 0.0)
    assert np.isclose(v.length(), 5.0)
    n = v.normalize()
    assert np.isclose(n.length(), 1.0)


def test_complex_components():
    n = vec3(1.5 + 4e-8j, 1.5, 1.5 + 0.1j)
    re = vec3.real(n)
    im = vec3.imag(n)
    assert np.allclose(re.components(), (1.5, 1.5, 1.5))
    assert np.allclose(im.components(), (4e-8, 0.0, 0.1))


def test_matmul_rotation():
    M = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    v = vec3(1.0, 0.0, 0.0).matmul(M)
    assert np.allclose(v.components(), (0.0, 1.0, 0.0))


def test_rgb_alias_and_lowering():
    assert rgb is vec3
    assert np.allclose(as_float3(vec3(1, 2, 3)), [1, 2, 3])
    assert np.allclose(as_float3((1, 2, 3)), [1, 2, 3])
    assert np.allclose(as_float3(2.0), [2, 2, 2])
    c = as_complex3(vec3(1 + 2j, 3, 4))
    assert c.dtype == np.complex128 and c[0] == 1 + 2j


def test_where_select():
    a, b = vec3(1.0, 1.0, 1.0), vec3(0.0, 0.0, 0.0)
    w = vec3.where(np.array([True, False]),
                   vec3(np.ones(2), np.ones(2), np.ones(2)),
                   vec3(np.zeros(2), np.zeros(2), np.zeros(2)))
    assert np.allclose(w.x, [1, 0])
    assert np.allclose((a == a), True)
    del b
