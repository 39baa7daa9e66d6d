// Independent path cross-validator: runs the *reference* implementation
// (header-only C++ from /root/reference) over paths solved by vamp_tpu and
// reports whether the reference's own edge validation accepts them — the
// role OMPL cross-validation plays in the reference's scripts
// (reference scripts/visualize_ompl.py; its OMPL stack is not available in
// this image, and the reference itself is the stronger oracle anyway).
//
// Build & run (driven by benchmarks/crosscheck.py):
//   g++ -O2 -march=native -std=c++17 \
//       -I /root/reference/src/impl -I tools/golden/stub \
//       tools/crosscheck/crosscheck_validate.cc -o /tmp/crosscheck_validate
//
// stdin line protocol (whitespace-separated floats):
//   ENV <nspheres> <ncapsules> <ncuboids>
//     S x y z r                                  (xnspheres)
//     C x1 y1 z1 xv yv zv r                      (xncapsules)
//     B cx cy cz a1x a1y a1z a2x a2y a2z a3x a3y a3z r1 r2 r3   (xncuboids)
//   PATH <nstates>
//     q0 .. q6                                   (xnstates)
//   ... (PATH blocks reuse the last ENV; ENV may repeat)
//
// stdout: one line per PATH: "<path_index> <valid 0|1> <first_bad_edge|-1>"

#include <cstdio>
#include <vector>

#include <vamp/vector.hh>
#include <vamp/collision/environment.hh>
#include <vamp/collision/validity.hh>
#include <vamp/planning/validate.hh>
#include <vamp/robots/panda_base.hh>

using namespace vamp;

static constexpr std::size_t rake = 8;
using Robot = robots::PandaBase<0, 0, 0>;  // origin-based Panda (vamp_tpu default)
using EnvF = collision::Environment<float>;
using EnvV = collision::Environment<FloatVector<rake>>;

int main()
{
    char tag[16];
    EnvF envf;
    bool have_env = false;
    int path_idx = 0;
    EnvV *envv = nullptr;  // current vectorized env (aligned heap allocation)

    while (std::scanf("%15s", tag) == 1)
    {
        if (tag[0] == 'E')  // ENV
        {
            int ns, nc, nb;
            if (std::scanf("%d %d %d", &ns, &nc, &nb) != 3)
                return 1;
            envf = EnvF();
            char t2[8];
            for (int i = 0; i < ns; ++i)
            {
                float x, y, z, r;
                std::scanf("%7s %f %f %f %f", t2, &x, &y, &z, &r);
                envf.spheres.emplace_back(collision::Sphere<float>(x, y, z, r));
            }
            for (int i = 0; i < nc; ++i)
            {
                float x1, y1, z1, xv, yv, zv, r;
                std::scanf("%7s %f %f %f %f %f %f %f", t2, &x1, &y1, &z1, &xv, &yv, &zv, &r);
                float rdv = 1.0F / (xv * xv + yv * yv + zv * zv);
                envf.capsules.emplace_back(
                    collision::Cylinder<float>(x1, y1, z1, xv, yv, zv, r, rdv));
            }
            for (int i = 0; i < nb; ++i)
            {
                float c[3], a[9], h[3];
                std::scanf("%7s", t2);
                for (int k = 0; k < 3; ++k)
                    std::scanf("%f", &c[k]);
                for (int k = 0; k < 9; ++k)
                    std::scanf("%f", &a[k]);
                for (int k = 0; k < 3; ++k)
                    std::scanf("%f", &h[k]);
                envf.cuboids.emplace_back(collision::Cuboid<float>(
                    c[0], c[1], c[2], a[0], a[1], a[2], a[3], a[4], a[5], a[6], a[7], a[8],
                    h[0], h[1], h[2]));
            }
            envf.sort();
            delete envv;
            envv = new EnvV(envf);
            have_env = true;
        }
        else if (tag[0] == 'P')  // PATH
        {
            int n;
            if (std::scanf("%d", &n) != 1 || !have_env)
                return 1;
            // Configuration loads an ALIGNED 8-float AVX vector from the
            // pointer: buffers must be 32B-aligned and rake-padded.
            std::vector<std::array<float, 8>> qs(n);
            for (int i = 0; i < n; ++i)
            {
                qs[i].fill(0.0F);
                for (std::size_t d = 0; d < Robot::dimension; ++d)
                    std::scanf("%f", &qs[i][d]);
            }
            int first_bad = -1;
            alignas(32) std::array<float, 8> qa, qb;
            for (int i = 0; i + 1 < n && first_bad < 0; ++i)
            {
                qa = qs[i];
                qb = qs[i + 1];
                typename Robot::Configuration a(qa.data());
                typename Robot::Configuration b(qb.data());
                bool ok = planning::validate_motion<Robot, rake, Robot::resolution>(
                    a, b, *envv);
                if (!ok)
                    first_bad = i;
            }
            std::printf("%d %d %d\n", path_idx++, first_bad < 0 ? 1 : 0, first_bad);
        }
        else
        {
            return 2;
        }
    }
    return 0;
}
