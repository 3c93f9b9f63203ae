"""Pipeline components: frontend, tracking, mapping, place recognition,
loop closure, bundle adjustment, and the full SLAM driver."""
