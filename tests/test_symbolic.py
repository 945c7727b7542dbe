"""Symbolic constraint-expression tests (Rust stwo constraint_framework/expr:
BaseExpr/ExtExpr AST, ExprEvaluator, degree bounds, simplify, random eval)."""
import pytest

from tstwo_tpu.constraint_framework import InfoEvaluator
from tstwo_tpu.constraint_framework.logup import LookupElements
from tstwo_tpu.constraint_framework.symbolic import (Add, Col, ColumnExpr,
                                                     Const, ExprEvaluator,
                                                     ExtConst, Mul, Neg,
                                                     Param, check_degree_bounds,
                                                     constraint_exprs)
from tstwo_tpu.examples.logup_lookup import LookupEval
from tstwo_tpu.examples.wide_fibonacci import WideFibonacciEval
from tstwo_tpu.fields import M31, QM31


def _col(i):
    return Col(ColumnExpr(1, i, 0))


def test_eval_expr_by_hand():
    a, b = _col(0), _col(1)
    e = (a + b) * a - 3
    asg = e.collect_variables().random_assignment(0)
    va, vb = asg.cols[a.col], asg.cols[b.col]
    three = QM31.from_base(M31.from_int(3))
    assert e.eval_expr(asg) == (va + vb) * va - three


def test_simplify_rules():
    x = _col(0)
    one, zero = Const(M31.one()), Const(M31.zero())
    assert (x * one).simplify() == x
    assert (x * zero).simplify() == ExtConst(QM31.zero())
    assert (x + zero).simplify() == x
    assert (x - zero).simplify() == x
    assert Neg(Neg(x)).simplify() == x
    folded = (Const(M31.from_int(3)) * Const(M31.from_int(5))).simplify()
    assert folded == ExtConst(QM31.from_u32_unchecked(15, 0, 0, 0))
    # zero - x becomes -x
    assert (zero - x).simplify() == Neg(x)


@pytest.mark.parametrize("make_eval", [
    lambda: WideFibonacciEval(4, sequence_length=6),
    lambda: LookupEval(4, LookupElements.dummy(1)),
    lambda: LookupEval(4, LookupElements.dummy(1), pairs=False),
])
def test_expr_evaluator_structure_matches_info(make_eval):
    fe = make_eval()
    sym = constraint_exprs(fe)
    info = InfoEvaluator(fe.log_size())
    fe.evaluate(info)
    assert len(sym.constraints) == info.n_constraints
    # every constraint simplifies to something that random-evals identically
    for seed, c in enumerate(sym.constraints):
        asg = c.collect_variables().random_assignment(seed)
        assert c.eval_expr(asg) == c.simplify().eval_expr(asg)


def test_degree_bounds():
    assert check_degree_bounds(
        WideFibonacciEval(4, sequence_length=5)) == [2, 2, 2]
    assert check_degree_bounds(
        LookupEval(4, LookupElements.dummy(1))) == [3]  # paired batch
    assert check_degree_bounds(
        LookupEval(4, LookupElements.dummy(1), pairs=False)) == [2, 2]

    class Bad(WideFibonacciEval):
        def max_constraint_log_degree_bound(self):
            return self.log_n_rows  # missing the +1

    with pytest.raises(ValueError, match="too small"):
        check_degree_bounds(Bad(4, sequence_length=5))


def test_format_constraints():
    sym = constraint_exprs(WideFibonacciEval(4, sequence_length=3))
    text = sym.format_constraints()
    assert "constraint 0" in text
    assert "trace_1_column_2_offset_0" in text
    sym2 = constraint_exprs(LookupEval(4, LookupElements.dummy(1)))
    text2 = sym2.constraints[0].format_expr()
    assert "cumsum_shift" in text2          # FormalLogupAtRow param
    assert "secure_param0" in text2         # bound relation randomness
    assert "offset_-1" in text2             # prev-row mask on last column
    assert "trace_0_column_0" in text2      # preprocessed Seq read


def test_param_and_intermediate():
    ev = ExprEvaluator()
    x = ev.next_trace_mask()
    inter = ev.add_intermediate(x * x)
    ev.add_constraint(inter + Param("p"))
    assert isinstance(inter, Param)
    text = ev.format_constraints()
    assert "let intermediate0" in text and "+ p)" in text
