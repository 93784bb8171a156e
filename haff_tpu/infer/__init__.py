from .evaluate import EvaluateResult, evaluate_fn, make_jitted_evaluate  # noqa: F401
from .generate import GenerateResult, greedy_generate  # noqa: F401
