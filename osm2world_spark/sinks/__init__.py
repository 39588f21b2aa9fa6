"""3D model serializers (SURVEY §2 S8): OBJ+MTL, POV-Ray, glTF/GLB.

The reference writes per-scene model files through imperative
stream-writer classes (core/.../output/obj/ObjOutput.java,
povray/POVRayOutput.java, gltf/GltfOutput.java). Here each format is
re-expressed as a relational plan: a faces/meshes DataFrame goes in,
one row per output file (tile) comes out, with the serialized text as
a column — so a 100-TB scene set serializes as one distributed job,
partitioned by tile, with no driver-side assembly. Binary glTF (GLB)
and the float32 buffer payloads are Arrow-batched numpy (mapInPandas);
everything text is pure Catalyst Columns.
"""
