from vivqa_tpu.resources.backup import AutoBackupTrigger, BackupHandler
from vivqa_tpu.resources.config import (BackupConfig, MonitoringIntervals,
                                        ReportIntervalConfig, ResourceConfig,
                                        ResourceThresholds)
from vivqa_tpu.resources.manager import (ResourceManager,
                                         get_resource_manager,
                                         resource_managed_training)
from vivqa_tpu.resources.monitor import (Alert, BaseResourceMonitor,
                                         CPUMonitor, DeviceMemoryMonitor,
                                         DiskMonitor, MemoryMonitor,
                                         ResourceMonitor, ResourceSnapshot)
from vivqa_tpu.resources.progress import (ProgressTracker, TaskInfo,
                                          TrainingProgressTracker)
from vivqa_tpu.resources.reports import ReportManager, format_report

__all__ = [
    "ResourceConfig", "ResourceThresholds", "MonitoringIntervals",
    "BackupConfig", "ReportIntervalConfig",
    "ResourceMonitor", "BaseResourceMonitor", "CPUMonitor", "MemoryMonitor",
    "DiskMonitor", "DeviceMemoryMonitor", "Alert", "ResourceSnapshot",
    "BackupHandler", "AutoBackupTrigger",
    "ProgressTracker", "TrainingProgressTracker", "TaskInfo",
    "ReportManager", "format_report",
    "ResourceManager", "get_resource_manager", "resource_managed_training",
]
