from oracle.oracle import (OracleParams, froxel_to_view, view_to_froxel,
                           froxel_to_world, world_to_froxel, look_at_matrix,
                           render_frame_oracle)
