"""Expression band algebra (gdal raster calc / VRT expression analogue)."""

from __future__ import annotations

import numpy as np
import pytest

from raydal.ops.calc import compile_expression, eval_expression


class TestExpression:
    def test_arithmetic_and_precedence(self):
        a = np.array([1.0, 2.0, 3.0])
        b = np.array([10.0, 20.0, 30.0])
        np.testing.assert_allclose(
            eval_expression("a + b * 2 - 1", {"a": a, "b": b}),
            a + b * 2 - 1)
        np.testing.assert_allclose(
            eval_expression("(a + b) / (a * 2) ** 2", {"a": a, "b": b}),
            (a + b) / (a * 2) ** 2)

    def test_functions(self):
        x = np.array([0.0, 1.0, 4.0])
        np.testing.assert_allclose(
            eval_expression("sqrt(x) + abs(-x)", {"x": x}),
            np.sqrt(x) + x)
        np.testing.assert_allclose(
            eval_expression("max(x, 2, 3 - x)", {"x": x}),
            np.maximum.reduce([x, np.full(3, 2.0), 3 - x]))

    def test_conditional_and_comparisons(self):
        x = np.array([1.0, 5.0, 9.0])
        np.testing.assert_allclose(
            eval_expression("if_(x > 4, 255, 0)", {"x": x}),
            np.where(x > 4, 255.0, 0.0))
        # muparser && / || spellings
        np.testing.assert_allclose(
            eval_expression("(x > 2) && (x < 8)", {"x": x}),
            ((x > 2) & (x < 8)).astype(float))
        np.testing.assert_allclose(
            eval_expression("(x < 2) || (x > 8)", {"x": x}),
            ((x < 2) | (x > 8)).astype(float))

    def test_muparser_if_and_ternary(self):
        # muparser spellings: if(c,a,b) and right-associative c ? a : b
        x = np.array([1.0, 5.0, 9.0])
        np.testing.assert_allclose(
            eval_expression("if(x > 4, 255, 0)", {"x": x}),
            np.where(x > 4, 255.0, 0.0))
        np.testing.assert_allclose(
            eval_expression("x > 4 ? 255 : 0", {"x": x}),
            np.where(x > 4, 255.0, 0.0))
        np.testing.assert_allclose(
            eval_expression("x > 8 ? 2 : x > 4 ? 1 : 0", {"x": x}),
            np.array([0.0, 1.0, 2.0]))
        np.testing.assert_allclose(
            eval_expression("sqrt(x > 4 ? x : 4 * (x < 2 ? 4 : 1))",
                            {"x": x}),
            np.sqrt(np.array([16.0, 5.0, 9.0])))
        import pytest as _pytest
        with _pytest.raises(ValueError):
            eval_expression("x > 4 ? 1", {"x": x})

    def test_compile_once_reuse(self):
        fn = compile_expression("b1 * 0.5 + b2 * 0.5")
        for seed in (0, 1):
            rng = np.random.default_rng(seed)
            b1, b2 = rng.random((2, 8, 8))
            np.testing.assert_allclose(fn({"b1": b1, "b2": b2}),
                                       b1 * 0.5 + b2 * 0.5)

    @pytest.mark.parametrize("bad", [
        "__import__('os')", "x.attr", "[1,2]", "lambda: 1", "f'{x}'",
        "open('/etc/passwd')", "x if x else 0",
    ])
    def test_rejects_non_whitelisted(self, bad):
        with pytest.raises((ValueError, SyntaxError)):
            compile_expression(bad)

    def test_unknown_variable(self):
        with pytest.raises(KeyError):
            eval_expression("nope + 1", {"x": np.zeros(2)})


class TestCalcStep:
    def test_grayscale_average(self, ray_session):
        import ray.data

        from raydal.io.codecs import decode
        from raydal.io.images import synthesize_images_batch
        from raydal.pipeline import run_pipeline

        t = synthesize_images_batch(np.arange(2))
        out = run_pipeline(
            ray.data.from_arrow(t),
            [("raster-calc", {"expr": "(b1 + b2 + b3) / 3"})])
        df = out.to_pandas()
        px = decode(df.iloc[0]["bytes"])
        orig = decode(t["bytes"][0].as_py())
        assert px.ndim == 2
        if t["fmt"][0].as_py() == "png":
            expect = np.clip(np.floor(
                orig.astype(np.float64).sum(axis=2) / 3 + 0.5),
                0, 255).astype(np.uint8)
            np.testing.assert_array_equal(px, expect)


def test_ternary_inside_function_arguments():
    """Regression: a ternary as ONE argument of a multi-arg call must
    not absorb the sibling arguments into its condition."""
    import numpy as np

    from raydal.ops.calc import compile_expression

    env = {"x": np.array([1.0, 5.0, 9.0]), "B": np.array([-2.0, 0.0, 3.0])}
    assert np.array_equal(
        compile_expression("max(x, x > 4 ? x : 4)")(env), [4.0, 5.0, 9.0])
    assert np.array_equal(
        compile_expression("min(x, B>0 ? B : 0)")(env), [0.0, 0.0, 3.0])
    assert np.array_equal(
        compile_expression("x > 4 ? (B > 0 ? 1 : 2) : 3")(env),
        [3.0, 2.0, 1.0])
