from gdrnet_tpu.eval import pose_errors
from gdrnet_tpu.eval.bop_writer import save_bop_results, load_bop_results
from gdrnet_tpu.eval.custom_evaluator import CustomEvaluator
from gdrnet_tpu.eval.report import scores_to_latex, write_latex_report

__all__ = ["pose_errors", "save_bop_results", "load_bop_results",
           "CustomEvaluator", "scores_to_latex", "write_latex_report"]
