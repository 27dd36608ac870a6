from .orchestrator import Pipeline, PipelineContext, PipelineRun, TaskRecord

__all__ = ["Pipeline", "PipelineContext", "PipelineRun", "TaskRecord"]
