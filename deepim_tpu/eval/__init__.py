from deepim_tpu.eval.evaluator import PoseEvaluator  # noqa: F401
