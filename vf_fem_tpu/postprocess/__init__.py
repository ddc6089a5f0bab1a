from . import base, fluid, solid
from .base import BaseStateMeasure, TimeSeries, TimeSeriesStats
