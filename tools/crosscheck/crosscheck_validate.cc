// Independent path cross-validator: runs the *reference* implementation
// (header-only C++ from /root/reference) over paths solved by vamp_tpu and
// reports whether the reference's own edge validation accepts them — the
// role OMPL cross-validation plays in the reference's scripts
// (reference scripts/visualize_ompl.py; its OMPL stack is not available in
// this image, and the reference itself is the stronger oracle anyway).
//
// Round 5: templated on robot (Panda / UR5 / Fetch — reference
// robots/{panda_base,ur5,fetch}.hh) and supports an end-effector
// attachment block (reference collision/attachments.hh;
// planning/validate.hh:43-44 dispatches to fkcc_attach when
// environment.attachments is set).
//
// Build & run (driven by benchmarks/crosscheck.py):
//   g++ -O2 -march=native -std=c++17 \
//       -I /root/reference/src/impl -I tools/golden/stub \
//       tools/crosscheck/crosscheck_validate.cc -o /tmp/crosscheck_validate
//
// stdin line protocol (whitespace-separated floats):
//   ROBOT <panda|ur5|fetch>
//   ENV <nspheres> <ncapsules> <ncuboids> <nattach>
//     S x y z r                                  (xnspheres)
//     C x1 y1 z1 xv yv zv r                      (xncapsules)
//     B cx cy cz a1x a1y a1z a2x a2y a2z a3x a3y a3z r1 r2 r3   (xncuboids)
//     T tx ty tz rx ry rz rw                     (once, iff nattach > 0)
//     AS x y z r                                 (xnattach, attachment-local)
//   PATH <nstates>
//     q0 .. q{dim-1}                             (xnstates)
//   ... (PATH blocks reuse the last ROBOT+ENV; both may repeat)
//
// stdout: one line per PATH: "<path_index> <valid 0|1> <first_bad_edge|-1>"

#include <cstdio>
#include <cstring>
#include <vector>

#include <vamp/vector.hh>
#include <vamp/collision/attachments.hh>
#include <vamp/collision/environment.hh>
#include <vamp/collision/validity.hh>
#include <vamp/planning/validate.hh>
#include <vamp/robots/panda_base.hh>
#include <vamp/robots/ur5.hh>
#include <vamp/robots/fetch.hh>

using namespace vamp;

static constexpr std::size_t rake = 8;
using Panda = robots::PandaBase<0, 0, 0>;  // origin-based Panda (vamp_tpu default)
using EnvF = collision::Environment<float>;
using EnvV = collision::Environment<FloatVector<rake>>;

template <typename Robot>
auto validate_path(const std::vector<std::array<float, 16>> &qs, const EnvV &envv) -> int
{
    // Configuration loads an ALIGNED vector from the pointer: buffers must
    // be 32B-aligned and rake-padded (16 floats covers dim<=14 padded).
    alignas(32) std::array<float, 16> qa, qb;
    const int n = static_cast<int>(qs.size());
    for (int i = 0; i + 1 < n; ++i)
    {
        qa = qs[i];
        qb = qs[i + 1];
        typename Robot::Configuration a(qa.data());
        typename Robot::Configuration b(qb.data());
        if (not planning::validate_motion<Robot, rake, Robot::resolution>(a, b, envv))
            return i;
    }
    return -1;
}

int main()
{
    char tag[16];
    EnvF envf;
    bool have_env = false;
    int path_idx = 0;
    int robot = 0;  // 0 = panda, 1 = ur5, 2 = fetch
    std::size_t dim = Panda::dimension;
    EnvV *envv = nullptr;  // current vectorized env (aligned heap allocation)

    while (std::scanf("%15s", tag) == 1)
    {
        if (tag[0] == 'R')  // ROBOT
        {
            char name[16];
            if (std::scanf("%15s", name) != 1)
                return 1;
            if (std::strcmp(name, "panda") == 0)
                robot = 0, dim = Panda::dimension;
            else if (std::strcmp(name, "ur5") == 0)
                robot = 1, dim = robots::UR5::dimension;
            else if (std::strcmp(name, "fetch") == 0)
                robot = 2, dim = robots::Fetch::dimension;
            else
                return 3;
        }
        else if (tag[0] == 'E')  // ENV
        {
            int ns, nc, nb, na;
            if (std::scanf("%d %d %d %d", &ns, &nc, &nb, &na) != 4)
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
            if (na > 0)
            {
                float t[7];
                std::scanf("%7s", t2);
                for (int k = 0; k < 7; ++k)
                    std::scanf("%f", &t[k]);
                collision::Attachment<float> att(t[0], t[1], t[2], t[3], t[4], t[5], t[6]);
                for (int i = 0; i < na; ++i)
                {
                    float x, y, z, r;
                    std::scanf("%7s %f %f %f %f", t2, &x, &y, &z, &r);
                    att.spheres.emplace_back(collision::Sphere<float>(x, y, z, r));
                }
                envf.attachments = att;
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
            std::vector<std::array<float, 16>> qs(n);
            for (int i = 0; i < n; ++i)
            {
                qs[i].fill(0.0F);
                for (std::size_t d = 0; d < dim; ++d)
                    std::scanf("%f", &qs[i][d]);
            }
            int first_bad = robot == 0 ? validate_path<Panda>(qs, *envv) :
                            robot == 1 ? validate_path<robots::UR5>(qs, *envv) :
                                         validate_path<robots::Fetch>(qs, *envv);
            std::printf("%d %d %d\n", path_idx++, first_bad < 0 ? 1 : 0, first_bad);
        }
        else
        {
            return 2;
        }
    }
    return 0;
}
