"""Expression compiler (Lepton-compatible) unit tests."""

import numpy as np
import pytest

from blues_tpu.core.expressions import compile_expression


def test_reference_lambda_functions():
    """The reference's default alchemical functions
    (blues/simulation.py:654-659) evaluate to the documented piecewise
    shapes."""
    ster = compile_expression("min(1, (1/0.3)*abs(lambda-0.5))")
    elec = compile_expression(
        "step(0.2-lambda) - 1/0.2*lambda*step(0.2-lambda) + 1/0.2*(lambda-0.8)*step(lambda-0.8)"
    )
    assert float(ster({"lambda": 0.0})) == 1.0
    assert float(ster({"lambda": 0.5})) == 0.0
    assert float(ster({"lambda": 0.35})) == pytest.approx(0.5)
    assert float(elec({"lambda": 0.0})) == 1.0
    assert float(elec({"lambda": 0.1})) == pytest.approx(0.5)
    assert float(elec({"lambda": 0.5})) == 0.0
    assert float(elec({"lambda": 0.9})) == pytest.approx(0.5)
    assert float(elec({"lambda": 1.0})) == pytest.approx(1.0)


def test_semicolon_definitions_resolve_in_reverse():
    """Lepton semantics: later statements define terms for earlier ones."""
    e = compile_expression("a + b; a = x^2; b = a + 1")
    assert float(e({"x": 3.0})) == pytest.approx(9 + 10)


def test_functions_and_precedence():
    e = compile_expression("2*x^2 + 1")  # ^ binds tighter than *
    assert float(e({"x": 3.0})) == 19.0
    e = compile_expression("-x^2")  # unary minus of the power
    assert float(e({"x": 2.0})) == -4.0
    e = compile_expression("select(step(x), sqrt(4), exp(0))")
    assert float(e({"x": 1.0})) == 2.0
    assert float(e({"x": -1.0})) == 1.0


def test_vectorized_evaluation():
    e = compile_expression("q1*q2/r^2")
    r = np.linspace(0.5, 2.0, 8)
    out = np.asarray(e({"q1": 2.0, "q2": 3.0, "r": r}))
    assert np.allclose(out, 6.0 / r**2)


def test_variables_and_errors():
    e = compile_expression("4*epsilon*((sigma/r)^12-(sigma/r)^6)")
    assert e.variables == {"epsilon", "sigma", "r"}
    with pytest.raises(KeyError):
        e({"sigma": 1.0, "r": 1.0})  # epsilon missing
    with pytest.raises(ValueError):
        compile_expression("2 +* 3")
    with pytest.raises(KeyError):
        compile_expression("bogusfn(x)")({"x": 1.0})
