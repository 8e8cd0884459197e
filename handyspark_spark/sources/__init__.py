from .sinks import (compact_to_target, write_bucketed,
                    write_partitioned, zorder_by, zorder_value)
